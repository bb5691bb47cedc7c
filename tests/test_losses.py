import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voiceprintrecognition_paddlepaddle_tpu.loss import LOSSES, build_loss
from voiceprintrecognition_paddlepaddle_tpu.optimizer.scheduler import (
    MarginScheduler, cosine_decay_with_warmup)
from voiceprintrecognition_paddlepaddle_tpu.utils.utils import dict_to_object


def _outputs(b=8, c=10, d=16, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    feats = jax.random.normal(k1, (b, d))
    # cosine-style logits in [-1, 1]
    logits = jnp.tanh(jax.random.normal(k2, (b, c)))
    labels = jnp.arange(b) % c
    return {"features": feats, "logits": logits}, labels


@pytest.mark.parametrize("name", list(LOSSES))
def test_losses_finite_scalar(name):
    kwargs = {"K": 2} if name == "SubCenterLoss" else {}
    loss_fn = LOSSES[name](**kwargs)
    out, labels = _outputs(c=10 if name != "SubCenterLoss" else 20)
    params = loss_fn.init_params()
    val = loss_fn(out, labels, params=params or None)
    assert val.shape == ()
    assert np.isfinite(float(val))


def test_ce_matches_manual():
    loss_fn = LOSSES["CELoss"]()
    out, labels = _outputs()
    logits = np.asarray(out["logits"], np.float64)
    # manual mean CE
    ex = np.exp(logits - logits.max(axis=1, keepdims=True))
    p = ex / ex.sum(axis=1, keepdims=True)
    manual = -np.mean(np.log(p[np.arange(len(labels)), np.asarray(labels)]))
    assert np.isclose(float(loss_fn(out, labels)), manual, atol=1e-5)


def test_aam_margin_zero_equals_scaled_ce():
    """With margin 0, AAM reduces to CE on scale*logits."""
    aam = LOSSES["AAMLoss"](margin=0.0, scale=32)
    ce = LOSSES["CELoss"]()
    out, labels = _outputs()
    scaled = {"logits": out["logits"] * 32, "features": out["features"]}
    assert np.isclose(float(aam(out, labels)), float(ce(scaled, labels)),
                      atol=1e-4)


def test_aam_manual_formula():
    aam = LOSSES["AAMLoss"](margin=0.2, scale=32)
    out, labels = _outputs()
    logits = np.asarray(out["logits"], np.float64)
    m, s = 0.2, 32.0
    cos_m, sin_m = math.cos(m), math.sin(m)
    th, mmm = math.cos(math.pi - m), 1 + math.cos(math.pi - m)
    sine = np.sqrt(1 - logits ** 2)
    phi = np.where(logits > th, logits * cos_m - sine * sin_m, logits - mmm)
    one_hot = np.eye(10)[np.asarray(labels)]
    z = (one_hot * phi + (1 - one_hot) * logits) * s
    ex = np.exp(z - z.max(axis=1, keepdims=True))
    p = ex / ex.sum(axis=1, keepdims=True)
    manual = -np.mean(np.log(p[np.arange(8), np.asarray(labels)]))
    assert np.isclose(float(aam(out, labels)), manual, atol=1e-5)


def test_aam_margin_increases_loss():
    out, labels = _outputs()
    a = LOSSES["AAMLoss"](margin=0.0)
    vals = [float(a(out, labels, margin=m)) for m in (0.0, 0.1, 0.3)]
    assert vals[0] < vals[1] < vals[2]


def test_am_manual():
    am = LOSSES["AMLoss"](margin=0.2, scale=30)
    out, labels = _outputs()
    logits = np.asarray(out["logits"], np.float64)
    one_hot = np.eye(10)[np.asarray(labels)]
    z = 30 * (logits - 0.2 * one_hot)
    ex = np.exp(z - z.max(axis=1, keepdims=True))
    p = ex / ex.sum(axis=1, keepdims=True)
    manual = -np.mean(np.log(p[np.arange(8), np.asarray(labels)]))
    assert np.isclose(float(am(out, labels)), manual, atol=1e-5)


def test_subcenter_reduces_over_k():
    sc = LOSSES["SubCenterLoss"](margin=0.2, K=2)
    aam = LOSSES["AAMLoss"](margin=0.2)
    out, labels = _outputs(c=10)
    # duplicate each class column: max over K identical = plain AAM
    dup = jnp.repeat(out["logits"], 2, axis=1)
    # repeat interleaves columns -> reshape (B, 10, 2) groups duplicates
    out2 = {"features": out["features"], "logits": dup}
    assert np.isclose(float(sc(out2, labels)), float(aam(out, labels)),
                      atol=1e-5)


def test_sphereface2_bias_param_grads():
    sf = LOSSES["SphereFace2"]()
    out, labels = _outputs()
    params = sf.init_params()
    assert "sphereface2_bias" in params
    g = jax.grad(lambda p: sf(out, labels, params=p))(params)
    assert np.isfinite(float(g["sphereface2_bias"]))


def test_triplet_prefers_separated_features():
    tri = LOSSES["TripletAngularMarginLoss"]()
    labels = jnp.array([0, 0, 1, 1])
    # well-separated, same-class-identical features
    good = jnp.array([[1., 0.], [1., 0.], [0., 1.], [0., 1.]])
    # inverted: anchor closer to other class
    bad = jnp.array([[1., 0.], [0., 1.], [1., 0.], [0., 1.]])
    logits = jnp.zeros((4, 2))
    lg = float(tri({"features": good, "logits": logits}, labels))
    lb = float(tri({"features": bad, "logits": logits}, labels))
    assert lg < lb


def test_build_loss_from_config():
    cfg = dict_to_object({"loss_conf": {
        "loss": "AAMLoss",
        "loss_args": {"margin": 0.2, "scale": 32, "easy_margin": False,
                      "label_smoothing": 0.0}}})
    loss = build_loss(cfg)
    out, labels = _outputs()
    assert np.isfinite(float(loss(out, labels)))


def test_warmup_cosine_schedule():
    sched = cosine_decay_with_warmup(0.001, step_per_epoch=100, fix_epoch=60,
                                     warmup_epoch=5, min_lr=1e-5)
    assert sched(0) == 0.0
    assert np.isclose(sched(250), 0.001 * 0.5)
    assert np.isclose(sched(500), 0.001)          # end of warmup
    assert np.isclose(sched(6000), 1e-5)          # end of decay
    assert np.isclose(sched(60000), 1e-5)
    mid = sched(500 + (6000 - 500) // 2)
    assert np.isclose(mid, 1e-5 + (0.001 - 1e-5) * 0.5, rtol=1e-2)
    # monotone decreasing after warmup
    vals = [sched(s) for s in range(500, 6000, 100)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_margin_scheduler_ramp():
    loss = LOSSES["AAMLoss"](margin=0.0)
    ms = MarginScheduler(loss, increase_start_epoch=18, fix_epoch=42,
                         step_per_epoch=100, initial_margin=0.0,
                         final_margin=0.3)
    assert ms.margin_at(0) == 0.0
    assert ms.margin_at(1799) == 0.0
    assert 0.0 < ms.margin_at(3000) < 0.3
    assert np.isclose(ms.margin_at(4200), 0.3)
    assert ms.margin_at(10**6) == 0.3
    # stepping drives criterion.update
    ms.step(current_step=4200)
    assert np.isclose(loss.margin, 0.3)
    # monotone non-decreasing
    vals = [ms.margin_at(s) for s in range(0, 5000, 50)]
    assert all(a <= b + 1e-12 for a, b in zip(vals, vals[1:]))
