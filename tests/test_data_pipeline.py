"""Dataset / samplers / collate / threaded loader."""

import wave as wave_mod

import numpy as np
import pytest

from voiceprintrecognition_paddlepaddle_tpu.data_utils import (
    DataLoader, PKSampler, SpeakerDataset, collate_features,
    collate_waveforms)
from voiceprintrecognition_paddlepaddle_tpu.data_utils.collate import (
    bucket_length)
from voiceprintrecognition_paddlepaddle_tpu.data_utils.pk_sampler import (
    BatchSampler)

SR = 16000


def _write_wav(path, seconds, freq, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(int(seconds * SR)) / SR
    sig = 0.3 * np.sin(2 * np.pi * freq * t) + 0.02 * rng.randn(len(t))
    with wave_mod.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes((np.clip(sig, -1, 1) * 32767).astype("<i2").tobytes())


@pytest.fixture(scope="module")
def listfile(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    lines = []
    durations = [0.8, 1.5, 2.5, 0.6, 1.1, 2.0]
    for i, dur in enumerate(durations):
        p = root / f"u{i}.wav"
        _write_wav(p, dur, 200 + 40 * i, seed=i)
        lines.append(f"{p}\t{i % 3}")
    lst = root / "list.txt"
    lst.write_text("\n".join(lines) + "\n", encoding="utf-8")
    return str(lst)


def test_train_mode_fixed_length(listfile):
    ds = SpeakerDataset(listfile, max_duration=1.0, min_duration=0.3,
                        mode="train", sample_rate=SR)
    for i in range(len(ds)):
        w, label, valid = ds[i]
        assert w.shape == (SR,)          # crop/pad to exactly 1 s
        assert 0 < valid <= SR
        assert label in (0, 1, 2)


def test_eval_mode_sorted_by_duration(listfile):
    ds = SpeakerDataset(listfile, max_duration=20, mode="eval",
                        sample_rate=SR)
    lens = [ds[i][0].shape[0] for i in range(len(ds))]
    assert lens == sorted(lens)


def test_min_duration_skip(tmp_path):
    _write_wav(tmp_path / "short.wav", 0.1, 100)
    _write_wav(tmp_path / "long.wav", 1.0, 100)
    lst = tmp_path / "l.txt"
    lst.write_text(f"{tmp_path/'short.wav'}\t0\n{tmp_path/'long.wav'}\t1\n",
                   encoding="utf-8")
    ds = SpeakerDataset(str(lst), max_duration=1.0, min_duration=0.5,
                        mode="train")
    w, label, _ = ds[0]  # falls through to item 1
    assert label == 1


def test_bucket_length_monotone():
    prev = 0
    for n in (1000, 16001, 30000, 48000, 100000):
        b = bucket_length(n)
        assert b >= n and b >= prev
        prev = b
    assert bucket_length(16000) == 16000
    assert bucket_length(32000) == 32000  # exact power stays exact
    assert bucket_length(32001) == 64000


def test_collate_waveforms():
    batch = [(np.ones(10000, np.float32), 1, 10000),
             (np.ones(20000, np.float32), 2, 15000)]
    waves, labels, ratios = collate_waveforms(batch)
    assert waves.shape[0] == 2 and waves.shape[1] >= 20000
    assert labels.tolist() == [1, 2]
    assert ratios[0] == 10000 / waves.shape[1]


def test_collate_features():
    batch = [(np.ones((50, 8), np.float32), 0, 50),
             (np.ones((90, 8), np.float32), 1, 90)]
    feats, labels, ratios = collate_features(batch)
    assert feats.shape[0] == 2 and feats.shape[2] == 8
    assert feats.shape[1] >= 90
    assert (feats[0, 50:] == 0).all()


def test_pk_sampler_structure(listfile):
    ds = SpeakerDataset(listfile, max_duration=1.0, mode="train")
    sampler = PKSampler(ds, batch_size=4, sample_per_id=2)
    batches = list(sampler)
    assert len(batches) == len(sampler) == len(ds) // 4
    for batch in batches:
        assert len(batch) == 4
        labels = [ds.labels[i] for i in batch]
        # exactly 2 classes × 2 samples
        vals, counts = np.unique(labels, return_counts=True)
        assert len(vals) == 2 and (counts == 2).all()


class _FakeLabelDS:
    """PKSampler only reads ``dataset.labels``."""

    def __init__(self, n=200, classes=10):
        self.labels = [np.int64(i % classes) for i in range(n)]

    def __len__(self):
        return len(self.labels)


def test_pk_sampler_rank_disjoint_per_step():
    ds = _FakeLabelDS()
    per_rank = []
    for rank in range(2):
        s = PKSampler(ds, batch_size=8, sample_per_id=2,
                      num_replicas=2, rank=rank)
        per_rank.append(list(s))
    assert len(per_rank[0]) == len(per_rank[1]) == 200 // 16
    # same step on different replicas never shares an item (and P×K
    # structure holds on every rank)
    for b0, b1 in zip(per_rank[0], per_rank[1]):
        assert not (set(b0) & set(b1)), (b0, b1)
        for b in (b0, b1):
            vals, counts = np.unique([ds.labels[i] for i in b],
                                     return_counts=True)
            assert len(vals) == 4 and (counts == 2).all()


def test_pk_sampler_seed_no_collisions():
    """(rank 0, epoch 2) must not replay (rank 1, epoch 1) — the old
    rank*max(epoch,1)+epoch seed collided there — and successive epochs on
    one rank must differ."""
    ds = _FakeLabelDS()

    def stream(rank, epoch):
        s = PKSampler(ds, batch_size=8, sample_per_id=2,
                      num_replicas=2, rank=rank)
        s.set_epoch(epoch)
        return [tuple(b) for b in s]

    assert stream(0, 2) != stream(1, 1)
    assert stream(0, 1) != stream(0, 2)
    # deterministic given (rank, epoch)
    assert stream(1, 3) == stream(1, 3)


def test_batch_sampler_sharding(listfile):
    ds = SpeakerDataset(listfile, max_duration=1.0, mode="train")
    all_idx = []
    for rank in range(2):
        s = BatchSampler(ds, batch_size=1, shuffle=False, drop_last=True,
                         num_replicas=2, rank=rank)
        for b in s:
            all_idx.extend(b)
    assert sorted(all_idx) == list(range(6))  # disjoint cover


def test_batch_sampler_eval_covers_uneven_shards():
    """drop_last=False (eval) must yield every item even when n does not
    divide by num_replicas — a floored length silently dropped the
    trailing utterances of low ranks, corrupting multi-process EER."""
    class Dummy:
        def __len__(self):
            return 13

    all_idx = []
    for rank in range(3):
        s = BatchSampler(Dummy(), batch_size=4, shuffle=False,
                         drop_last=False, num_replicas=3, rank=rank)
        got = [j for b in s for j in b]
        assert len(got) == (13 // 3 + (1 if rank < 13 % 3 else 0))
        all_idx.extend(got)
    assert sorted(all_idx) == list(range(13))  # complete disjoint cover


def test_threaded_loader_order_and_content(listfile):
    ds = SpeakerDataset(listfile, max_duration=1.0, mode="train", seed=0)
    sampler = BatchSampler(ds, batch_size=2, shuffle=False, drop_last=False)
    loader = DataLoader(ds, sampler,
                        collate_fn=lambda items: collate_waveforms(items),
                        num_workers=3)
    assert len(loader) == 3
    out = list(loader)
    assert len(out) == 3
    # deterministic order: labels follow the unshuffled index order
    labels = np.concatenate([b[1] for b in out]).tolist()
    assert labels == [ds.labels[i] for i in range(6)]


def test_loader_propagates_errors(listfile):
    ds = SpeakerDataset(listfile, max_duration=1.0, mode="train")

    class Broken:
        labels = ds.labels
        def __len__(self):
            return len(ds)
        def __getitem__(self, i):
            raise RuntimeError("boom")

    sampler = BatchSampler(Broken(), batch_size=2, shuffle=False,
                           drop_last=False)
    loader = DataLoader(Broken(), sampler,
                        collate_fn=lambda items: items, num_workers=2)
    with pytest.raises(RuntimeError, match="boom"):
        list(loader)
