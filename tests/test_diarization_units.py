"""Diarization pipeline internals: chunking, label correction, centroid
merging, postprocess smoothing, spectral clustering on separable data."""

import numpy as np
import pytest

from voiceprintrecognition_paddlepaddle_tpu.infer_utils.speaker_diarization import (
    SpeakerDiarization, SpectralCluster)
from voiceprintrecognition_paddlepaddle_tpu.ops.audio import AudioSegment


def test_chunking_windows():
    sd = SpeakerDiarization(seg_duration=1.5, seg_shift=0.75,
                            sample_rate=16000)
    data = np.arange(16000 * 4, dtype=np.float32)
    segs = sd._chunk([[2.0, 6.0, data]])
    # windows: 1.5s length, 0.75s shift over 4s of data
    assert all(abs((e - s) - 1.5) < 1e-6 for s, e, _ in segs)
    assert abs(segs[0][0] - 2.0) < 1e-6
    assert abs(segs[1][0] - 2.75) < 1e-6
    assert abs(segs[-1][1] - 6.0) < 1e-6  # 4 s of data offset by 2 s start
    assert all(c.shape[0] == 24000 for _, _, c in segs)


def test_short_audio_rejected():
    sd = SpeakerDiarization()
    seg = AudioSegment(np.random.RandomState(0).randn(16000).astype(np.float32) * 0.3,
                       16000)
    with pytest.raises(AssertionError):
        sd._check_audio_list([[0.0, 1.0, seg.samples]])


def test_correct_labels_first_appearance():
    out = SpeakerDiarization._correct_labels(np.array([5, 5, 2, 9, 2]))
    assert out.tolist() == [0, 0, 1, 2, 1]


def test_merge_by_cos():
    labels = np.array([0, 1, 2, 0, 1, 2])
    centers = np.array([[1.0, 0.0], [0.99, 0.05], [0.0, 1.0]])
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    merged = SpeakerDiarization._merge_by_cos(labels, centers, 0.9)
    # speakers 0 and 1 merge (cos ~0.999); 2 stays
    assert merged.max() == 1
    assert merged[0] == merged[1] == merged[3] == merged[4]
    assert merged[2] == merged[5] != merged[0]


def test_clustering_centers_align_with_labels_after_merge():
    """Regression: centers returned by clustering() must index by the
    *merged* labels (pre-merge centroids are misaligned once labels are
    renumbered), otherwise audio-db retrieval names the wrong speakers."""
    rng = np.random.RandomState(0)
    # three blobs; two nearly identical so the centroid merge fires
    base = np.eye(16)
    X = np.concatenate([
        rng.randn(30, 16) * 0.02 + base[0],
        rng.randn(30, 16) * 0.02 + (0.995 * base[0] + 0.1 * base[1]),
        rng.randn(30, 16) * 0.02 + base[5],
    ])
    sd = SpeakerDiarization(merge_threshold=0.9)
    labels, centers = sd.clustering(X, speaker_num=3)
    assert labels.max() + 1 == centers.shape[0] == 2  # the merge happened
    for lab in range(centers.shape[0]):
        true_mean = X[labels == lab].mean(0)
        cos = float(centers[lab] @ true_mean
                    / (np.linalg.norm(centers[lab])
                       * np.linalg.norm(true_mean)))
        assert cos > 0.9999, f"label {lab} misaligned with center: {cos}"


def test_postprocess_merges_and_smooths():
    sd = SpeakerDiarization()
    segments = [[0.0, 1.5, None], [0.75, 2.25, None], [2.2, 3.7, None],
                [3.6, 5.1, None]]
    labels = np.array([0, 0, 1, 1])
    out = sd.postprocess(segments, labels)
    assert out[0]["speaker"] == 0 and out[-1]["speaker"] == 1
    # overlap split at midpoint: boundaries are monotone and disjoint
    for a, b in zip(out, out[1:]):
        assert a["end"] <= b["start"] + 1e-9


def test_spectral_cluster_two_blobs():
    rng = np.random.RandomState(0)
    a = rng.randn(40, 16) * 0.05 + np.eye(16)[0]
    b = rng.randn(40, 16) * 0.05 + np.eye(16)[1]
    X = np.concatenate([a, b])
    labels = SpectralCluster()(X)
    assert len(set(labels[:40])) == 1
    assert len(set(labels[40:])) == 1
    assert labels[0] != labels[40]


def test_spectral_cluster_oracle_num():
    rng = np.random.RandomState(1)
    X = np.concatenate([rng.randn(30, 8) * 0.05 + np.eye(8)[i]
                        for i in range(3)])
    labels = SpectralCluster()(X, oracle_num=3)
    assert len(set(labels.tolist())) == 3
