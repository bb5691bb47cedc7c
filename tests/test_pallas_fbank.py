"""Fused Pallas fbank kernel vs the jnp reference path (interpret mode on
CPU; the same kernel compiles for the TPU in bench.py)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # interpret-mode Pallas: excluded from fast tier

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


def test_compute_feature_cmn_stays_split():
    # the in-kernel CMN fold was device-measured slower and deleted
    # (ROADMAP "Measured decisions"); compute_feature must produce the
    # split-path result: fbank kernel (or jnp fbank) + apply_cmn_and_mask
    from voiceprintrecognition_paddlepaddle_tpu.ops.features import (
        apply_cmn_and_mask, compute_feature)

    rng = np.random.RandomState(2)
    waves = (rng.randn(4, 16000 * 2) * 0.1).astype(np.float32)
    ratios = np.asarray([1.0, 0.31, 0.5, 0.77], np.float32)
    ref = np.asarray(apply_cmn_and_mask(
        kaldi.fbank(waves, sr=16000, n_mels=80), ratios))
    got = np.asarray(compute_feature(waves, "Fbank", sr=16000, n_mels=80,
                                     input_lens_ratio=ratios))
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 1e-5

    # the actual fold guard (on CPU the dispatcher never engages the
    # kernel, so the check above alone would be f(x) == f(x)): the
    # KERNEL's interpret-mode output must be RAW log-mel — if anyone
    # re-folds CMN/masking inside, this diverges by the mean magnitude
    raw = np.asarray(fbank_pallas(waves, sr=16000, n_mels=80,
                                  interpret=True))
    ref_raw = np.asarray(kaldi.fbank(waves, sr=16000, n_mels=80))
    assert np.abs(raw - ref_raw).max() < 2e-3
    # and raw kernel output + the split CMN reproduces the dispatcher
    # result within the kernel's bf16-DFT tolerance
    got_split = np.asarray(apply_cmn_and_mask(raw, ratios))
    assert np.abs(got_split - ref).max() < 2e-3
