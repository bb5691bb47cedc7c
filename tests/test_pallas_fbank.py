"""Fused Pallas fbank kernel vs the jnp reference path (interpret mode on
CPU; the same kernel compiles for the TPU in bench.py)."""

import numpy as np
import pytest

from voiceprintrecognition_paddlepaddle_tpu.ops import kaldi
from voiceprintrecognition_paddlepaddle_tpu.ops.pallas_fbank import fbank_pallas


def test_matches_jnp_fbank():
    rng = np.random.RandomState(0)
    waves = (rng.randn(3, 16000) * 0.1).astype(np.float32)
    ref = np.asarray(kaldi.fbank(waves, sr=16000, n_mels=80))
    got = np.asarray(fbank_pallas(waves, sr=16000, n_mels=80, interpret=True))
    assert got.shape == ref.shape
    # the kernel's 3-pass bf16 DFT differs from the fp32 jnp path only in
    # the lo*lo product term; the residual shows up solely on near-silent
    # bins (log-mel around -14), so bound the bulk tightly and the tail
    # loosely
    d = np.abs(got - ref)
    assert d.max() < 2e-2
    assert np.percentile(d, 99) < 1e-3


def test_row_padding_path():
    # rows = B*T deliberately not a multiple of the 256-row tile
    rng = np.random.RandomState(1)
    waves = (rng.randn(1, 8000) * 0.1).astype(np.float32)  # 48 frames
    ref = np.asarray(kaldi.fbank(waves, sr=16000, n_mels=40))
    got = np.asarray(fbank_pallas(waves, sr=16000, n_mels=40, interpret=True))
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 2e-3


def test_cmn_fold_full_length():
    # cmn=True with no ratios == kaldi.fbank + unmasked apply_cmn_and_mask
    from voiceprintrecognition_paddlepaddle_tpu.ops.features import (
        apply_cmn_and_mask)

    rng = np.random.RandomState(2)
    waves = (rng.randn(4, 16000 * 2) * 0.1).astype(np.float32)
    ref = apply_cmn_and_mask(kaldi.fbank(waves, sr=16000, n_mels=80))
    got = np.asarray(fbank_pallas(waves, sr=16000, n_mels=80,
                                  interpret=True, cmn=True))
    assert got.shape == ref.shape
    d = np.abs(got - np.asarray(ref))
    assert d.max() < 2e-2
    assert np.percentile(d, 99) < 1e-3


def test_cmn_fold_ragged_lengths():
    # masked CMN: mean over valid frames only, padded tail zeroed —
    # bit-for-bit the apply_cmn_and_mask contract (same floor(ratio*T))
    from voiceprintrecognition_paddlepaddle_tpu.ops.features import (
        apply_cmn_and_mask)

    rng = np.random.RandomState(3)
    waves = (rng.randn(6, 16000 * 3) * 0.1).astype(np.float32)
    ratios = np.asarray([1.0, 0.31, 0.5, 0.77, 0.05, 0.999], np.float32)
    ref = np.asarray(apply_cmn_and_mask(
        kaldi.fbank(waves, sr=16000, n_mels=80), ratios))
    got = np.asarray(fbank_pallas(waves, sr=16000, n_mels=80,
                                  interpret=True, cmn=True,
                                  input_lens_ratio=ratios))
    assert got.shape == ref.shape
    t = ref.shape[1]
    counts = (ratios * t).astype(np.int32)
    for i, c in enumerate(counts):
        # tail exactly zero, valid prefix within kernel tolerance
        assert np.all(got[i, c:] == 0.0)
        assert np.abs(got[i, :c] - ref[i, :c]).max() < 2e-2


def test_cmn_fold_row_padding_path():
    # single utterance exercising the rows%8 fallback with a short ratio
    from voiceprintrecognition_paddlepaddle_tpu.ops.features import (
        apply_cmn_and_mask)

    rng = np.random.RandomState(4)
    waves = (rng.randn(1, 8000) * 0.1).astype(np.float32)  # 48 frames
    ratios = np.asarray([0.6], np.float32)
    ref = np.asarray(apply_cmn_and_mask(
        kaldi.fbank(waves, sr=16000, n_mels=40), ratios))
    got = np.asarray(fbank_pallas(waves, sr=16000, n_mels=40,
                                  interpret=True, cmn=True,
                                  input_lens_ratio=ratios))
    assert np.abs(got - ref).max() < 2e-3
