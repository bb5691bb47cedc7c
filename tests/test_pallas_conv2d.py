"""Space-to-depth Pallas conv op (FCM training path) vs lax.conv and its
autodiff gradients (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voiceprintrecognition_paddlepaddle_tpu.models.pallas_conv2d import (
    conv2d_sd, sd_supported)


def _ref(x, w, b, stride):
    y = jax.lax.conv_general_dilated(
        x, w, (stride, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def _data(rng, f, t):
    x = jnp.asarray(rng.randn(3, f, t, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 32, 32).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(32).astype(np.float32))
    return x, w, b


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("f,t", [(40, 37), (80, 20), (20, 64)])
def test_forward_matches_lax(stride, f, t):
    rng = np.random.RandomState(f * t + stride)
    x, w, b = _data(rng, f, t)
    ref = _ref(x, w, b, stride)
    got = conv2d_sd(x, w, b, stride, True)
    assert got.shape == ref.shape
    assert float(jnp.abs(ref - got).max()) < 1e-4


@pytest.mark.parametrize("stride", [1, 2])
def test_gradients_match_lax(stride):
    """Full custom VJP (Pallas dgrad + wgrad) vs jax.grad of lax.conv —
    covers the mirrored even/odd-output stride-2 input gradient and the
    packed weight-gradient unpack-sum."""
    rng = np.random.RandomState(stride)
    x, w, b = _data(rng, 40, 21)
    cot = jnp.asarray(
        rng.randn(3, 40 // stride, 21, 32).astype(np.float32))
    gref = jax.grad(lambda *a: (_ref(*a, stride) * cot).sum(),
                    argnums=(0, 1, 2))(x, w, b)
    gpal = jax.grad(lambda *a: (conv2d_sd(*a, stride, True) * cot).sum(),
                    argnums=(0, 1, 2))(x, w, b)
    for r, p in zip(gref, gpal):
        scale = max(1.0, float(jnp.abs(r).max()))
        assert float(jnp.abs(r - p).max()) < 1e-4 * scale


def test_bf16_compute(dtype=jnp.bfloat16):
    rng = np.random.RandomState(0)
    x, w, b = _data(rng, 40, 30)
    ref = np.asarray(_ref(x, w, b, 1))
    got = np.asarray(conv2d_sd(x.astype(dtype), w.astype(dtype),
                               b.astype(dtype), 1, True)).astype(np.float32)
    cos = float((ref * got).sum()
                / (np.linalg.norm(ref) * np.linalg.norm(got)))
    assert cos > 0.999


def test_supported_gate():
    assert sd_supported((4, 40, 298, 32), 1)
    assert sd_supported((4, 80, 298, 32), 2)
    assert not sd_supported((4, 40, 298, 64), 1)     # C != 32
    assert not sd_supported((4, 41, 298, 32), 1)     # odd F
    assert not sd_supported((4, 40, 4096, 32), 1)    # VMEM cap
    assert not sd_supported((4, "b", 298, 32), 1)    # symbolic dim


def test_fcm_train_step_integration(monkeypatch):
    """Whole FCM in train mode: SDConv's Pallas op (interpret) inside the
    real flax graph — BN batch stats, residuals, promote_dtype, custom
    VJP — matches the lax path's loss and every parameter gradient."""
    from voiceprintrecognition_paddlepaddle_tpu.models import campplus

    fcm = campplus.FCM()
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 48, 80).astype(np.float32))
    v = fcm.init(jax.random.PRNGKey(0), feats, train=True)

    def loss_fn(params):
        out, mut = fcm.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            feats, train=True, mutable=["batch_stats"])
        return (out * out).mean(), mut

    monkeypatch.setattr(campplus, "_SDCONV", "0")
    (l_ref, mut_ref), g_ref = jax.value_and_grad(
        loss_fn, has_aux=True)(v["params"])
    monkeypatch.setattr(campplus, "_SDCONV", "force-interpret")
    (l_pal, mut_pal), g_pal = jax.value_and_grad(
        loss_fn, has_aux=True)(v["params"])

    assert abs(float(l_ref) - float(l_pal)) < 1e-5 * max(1, abs(float(l_ref)))
    flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_p = jax.tree_util.tree_leaves(g_pal)
    assert len(flat_r) == len(flat_p)
    for (path, r), p in zip(flat_r, flat_p):
        scale = max(1.0, float(jnp.abs(r).max()))
        assert float(jnp.abs(r - p).max()) < 5e-4 * scale, path
    # running batch stats update identically
    for r, p in zip(jax.tree_util.tree_leaves(mut_ref),
                    jax.tree_util.tree_leaves(mut_pal)):
        assert float(jnp.abs(r - p).max()) < 1e-4


def test_fcm_param_tree_unchanged():
    """SDConv keeps the nn.Conv-era param paths (Conv_0/1/2 with
    kernel+bias) so existing msgpack/Orbax checkpoints load."""
    from voiceprintrecognition_paddlepaddle_tpu.models.campplus import FCM
    v = FCM().init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 80)),
                   train=False)
    p = v["params"]
    assert set(p["BasicResBlock_0"]) == {
        "Conv_0", "BatchNorm_0", "Conv_1", "BatchNorm_1", "Conv_2",
        "BatchNorm_2"}
    assert p["BasicResBlock_0"]["Conv_0"]["kernel"].shape == (3, 3, 32, 32)
    assert p["Conv_1"]["kernel"].shape == (3, 3, 32, 32)   # final conv
