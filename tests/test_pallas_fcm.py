"""Fused Pallas FCM front-end vs the XLA module (interpret mode on CPU;
the same comparison runs on device in tools/fcm_kernel_bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy suite: excluded from the < 5-min fast tier

from voiceprintrecognition_paddlepaddle_tpu.models.campplus import FCM
from voiceprintrecognition_paddlepaddle_tpu.models import pallas_fcm
from voiceprintrecognition_paddlepaddle_tpu.models.pallas_fcm import (
    FCM_MAX_FRAMES, fcm_pallas, fcm_supported, pack_fcm)


@pytest.fixture(scope="module")
def fcm_and_vars():
    model = FCM()
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 80)),
                   train=False)
    # non-trivial batch stats so the BN fold is actually exercised
    v = jax.tree_util.tree_map(
        lambda a: a + 0.05 * jnp.arange(a.size, dtype=a.dtype).reshape(
            a.shape) / a.size, v)
    variables = {"params": {"FCM_0": v["params"]},
                 "batch_stats": {"FCM_0": v["batch_stats"]}}
    return model, v, variables


@pytest.mark.parametrize("t", [298, 297, 149, 17, 9])
def test_fcm_kernel_fp32_exact(fcm_and_vars, t):
    """fp32 interpret mode matches the XLA FCM to float rounding for even,
    odd and tiny bucket lengths (the odd case exercises the half-valid
    final time group)."""
    model, v, variables = fcm_and_vars
    rng = np.random.RandomState(t)
    feats = jnp.asarray(rng.randn(3, t, 80).astype(np.float32))
    ref = np.asarray(model.apply(v, feats, train=False))
    packed = pack_fcm(variables, compute_dtype=jnp.float32)
    got = np.asarray(fcm_pallas(variables, feats, interpret=True,
                                packed=packed))
    assert got.shape == ref.shape == (3, t, 320)
    assert np.abs(ref - got).max() < 1e-4 * max(1.0, np.abs(ref).max())


def test_fcm_kernel_bf16_tolerance(fcm_and_vars):
    model, v, variables = fcm_and_vars
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(4, 200, 80).astype(np.float32))
    ref = np.asarray(model.apply(v, feats, train=False))
    got = np.asarray(fcm_pallas(variables, feats, interpret=True))
    cos = float((ref * got).sum()
                / (np.linalg.norm(ref) * np.linalg.norm(got)))
    assert cos > 0.9999
    assert np.abs(ref - got).max() < 0.05 * max(1.0, np.abs(ref).max())


def test_fcm_kernel_batch_parity(fcm_and_vars):
    """Per-utterance results are independent of the rest of the batch
    (one grid step per utterance)."""
    model, v, variables = fcm_and_vars
    rng = np.random.RandomState(1)
    feats = rng.randn(5, 96, 80).astype(np.float32)
    packed = pack_fcm(variables, compute_dtype=jnp.float32)
    full = np.asarray(fcm_pallas(variables, jnp.asarray(feats),
                                 interpret=True, packed=packed))
    one = np.asarray(fcm_pallas(variables, jnp.asarray(feats[2:3]),
                                interpret=True, packed=packed))
    np.testing.assert_allclose(full[2:3], one, rtol=0, atol=1e-6)


@pytest.mark.parametrize("t", [600, 601])
def test_fcm_kernel_chunked_long_bucket(fcm_and_vars, t):
    """Buckets past the single-pass VMEM window run the same kernel over
    overlapping halo windows — exact at chunk boundaries (the halo covers
    the 9-conv receptive field) for even and odd lengths."""
    model, v, variables = fcm_and_vars
    rng = np.random.RandomState(t)
    feats = jnp.asarray(rng.randn(2, t, 80).astype(np.float32))
    ref = np.asarray(model.apply(v, feats, train=False))
    packed = pack_fcm(variables, compute_dtype=jnp.float32)
    got = np.asarray(fcm_pallas(variables, feats, interpret=True,
                                packed=packed))
    assert got.shape == ref.shape
    assert np.abs(ref - got).max() < 1e-4 * max(1.0, np.abs(ref).max())


def test_fcm_supported_gate():
    assert fcm_supported(298, 80)
    assert fcm_supported(FCM_MAX_FRAMES, 80)
    assert not fcm_supported(FCM_MAX_FRAMES + 1, 80)
    assert not fcm_supported(298, 64)                  # non-80-mel config


def test_embed_path_uses_fcm_kernel(fcm_and_vars, monkeypatch):
    """campplus_embed_pallas routes through the FCM kernel when supported
    and falls back to XLA beyond the bucket cap / under the env switch."""
    from voiceprintrecognition_paddlepaddle_tpu.models import (
        pallas_campplus as pc)

    calls = {"n": 0}
    real = pallas_fcm.fcm_pallas

    def spy(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(pallas_fcm, "fcm_pallas", spy)
    model = __import__(
        "voiceprintrecognition_paddlepaddle_tpu.models.campplus",
        fromlist=["CAMPPlus"]).CAMPPlus(input_size=80, embd_dim=192)
    feats = jnp.zeros((2, 64, 80), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), feats, train=False)
    pc.campplus_embed_pallas(model, variables, feats, interpret=True)
    assert calls["n"] == 1

    monkeypatch.setattr(pc, "_FCM_PALLAS", False)
    pc.campplus_embed_pallas(model, variables, feats, interpret=True)
    assert calls["n"] == 1      # XLA fallback did not call the kernel
