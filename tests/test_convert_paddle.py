"""Paddle-checkpoint converter: per-backbone key-map coverage, synthetic
round-trips, and numerical validation of the layout conventions.

Without paddle in this environment, real ``model.pdparams`` files can't be
produced — but everything that can go wrong in the converter is testable:

1. the spec's flax paths must cover the real flax tree of every shipped
   config *exactly* (params and batch_stats) — catches any name/shape drift;
2. a synthetic paddle-layout state dict (random values, paddle shapes
   derived by the inverse transforms) must round-trip into a tree the model
   accepts and run end-to-end;
3. the transpose conventions are checked numerically against
   ``torch.nn.functional.conv1d/conv2d`` (torch shares paddle's OIK/OIHW
   conv layouts) and the flatten-order permutation against an explicit
   NCHW channel-major flatten.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy suite: excluded from the < 5-min fast tier
import yaml

from tools.convert_paddle_checkpoint import (SPECS, _flatten_perm, _t_conv1d,
                                             _t_conv2d, convert_state,
                                             spec_classifier)
from voiceprintrecognition_paddlepaddle_tpu.models import MODELS
from voiceprintrecognition_paddlepaddle_tpu.models.fc import \
    SpeakerIdentification

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")
CONFIGS = ["cam++.yml", "ecapa_tdnn.yml", "eres2net.yml", "eres2netv2.yml",
           "res2net.yml", "resnet_se.yml", "tdnn.yml"]


def _load_cfg(fname):
    with open(os.path.join(CONFIG_DIR, fname), encoding="utf-8") as fh:
        cfg = yaml.safe_load(fh)
    name = cfg["model_conf"]["model"]
    args = cfg["model_conf"].get("model_args") or {}
    n_mels = (cfg["preprocess_conf"].get("method_args") or {}).get("n_mels", 80)
    return name, args, n_mels


def _flat_paths(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flat_paths(v, p))
        else:
            out[p] = tuple(v.shape)
    return out


def _model_tree_shapes(name, args, input_size):
    model = MODELS[name](input_size=input_size, **args)
    probe = jnp.zeros((1, 98, input_size), jnp.float32)
    v = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), probe, train=False))
    return (_flat_paths(v["params"]),
            _flat_paths(dict(v.get("batch_stats", {}))))


def _synth_paddle_state(entries, param_shapes, stat_shapes, rng):
    """Random paddle-layout arrays whose shapes invert each transform."""
    state = {}
    for pkey, coll, fpath, _tf, kind in entries:
        shapes = param_shapes if coll == "params" else stat_shapes
        fshape = shapes[fpath]
        if kind == "conv1d_w":
            pshape = (fshape[2], fshape[1], fshape[0])
        elif kind == "conv2d_w":
            pshape = (fshape[3], fshape[2], fshape[0], fshape[1])
        elif kind == "conv1d_as_dense_w":
            pshape = (fshape[1], fshape[0], 1)
        else:
            pshape = fshape
        arr = rng.randn(*pshape).astype(np.float32)
        if pkey.endswith("._variance"):
            arr = np.abs(arr) + 0.5  # variances must be positive
        elif kind in ("conv1d_w", "conv2d_w", "dense_w",
                      "conv1d_as_dense_w", "raw"):
            # fan-in scaling: unscaled N(0,1) weights overflow float32
            # through CAM++'s 52-layer dense trunk
            fan_in = int(np.prod(pshape[1:])) if len(pshape) > 1 else 1
            arr = arr / np.sqrt(max(fan_in, 1))
        state[pkey] = arr
    return state


@pytest.mark.parametrize("fname", CONFIGS)
def test_spec_covers_shipped_config_tree(fname):
    name, args, n_mels = _load_cfg(fname)
    param_shapes, stat_shapes = _model_tree_shapes(name, args, n_mels)
    entries = SPECS[name](n_mels, **args)
    spec_params = {f for (_, c, f, _, _) in entries if c == "params"}
    spec_stats = {f for (_, c, f, _, _) in entries if c == "batch_stats"}
    missing_p = set(param_shapes) - spec_params
    extra_p = spec_params - set(param_shapes)
    missing_s = set(stat_shapes) - spec_stats
    extra_s = spec_stats - set(stat_shapes)
    assert not missing_p, f"{name}: flax params unmapped: {sorted(missing_p)[:6]}"
    assert not extra_p, f"{name}: spec maps nonexistent params: {sorted(extra_p)[:6]}"
    assert not missing_s, f"{name}: batch_stats unmapped: {sorted(missing_s)[:6]}"
    assert not extra_s, f"{name}: spec maps nonexistent stats: {sorted(extra_s)[:6]}"
    # paddle keys must be unique
    pkeys = [p for (p, _, _, _, _) in entries]
    assert len(pkeys) == len(set(pkeys))


@pytest.mark.parametrize("fname", CONFIGS)
def test_synthetic_roundtrip_matches_shapes(fname):
    name, args, n_mels = _load_cfg(fname)
    param_shapes, stat_shapes = _model_tree_shapes(name, args, n_mels)
    entries = SPECS[name](n_mels, **args)
    rng = np.random.RandomState(0)
    state = _synth_paddle_state(entries, param_shapes, stat_shapes, rng)
    tree = convert_state(state, name, n_mels, model_args=args)
    got_p = _flat_paths(tree["params"]["backbone"])
    got_s = _flat_paths(tree["batch_stats"]["backbone"])
    assert got_p == param_shapes
    assert got_s == stat_shapes


# the functional smoke uses small models (fast init on CPU)
SMALL = {
    "TDNN": dict(channels=32, embd_dim=16),
    "EcapaTdnn": dict(channels=(32, 32, 32, 32, 96), res2net_scale=4,
                      se_channels=16, attention_channels=16, embd_dim=16),
    "Res2Net": dict(m_channels=8, layers=(1, 1, 1, 1), embd_dim=16),
    "ResNetSE": dict(num_filters=(8, 8, 16, 16), layers=(1, 1, 1, 1),
                     embd_dim=16),
    "ERes2Net": dict(m_channels=8, num_blocks=(1, 1, 1, 1), embd_dim=16),
    "ERes2NetV2": dict(m_channels=8, num_blocks=(1, 1, 1, 1), embd_dim=16),
    "CAMPPlus": dict(growth_rate=8, bn_size=2, init_channels=32, embd_dim=16),
}


@pytest.mark.parametrize("name", sorted(SMALL))
def test_converted_tree_runs(name):
    args = SMALL[name]
    input_size = 40
    model = MODELS[name](input_size=input_size, **args)
    probe = jnp.zeros((2, 98, input_size), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), probe, train=False)
    param_shapes = _flat_paths(variables["params"])
    stat_shapes = _flat_paths(dict(variables.get("batch_stats", {})))

    entries = SPECS[name](input_size, **args)
    rng = np.random.RandomState(1)
    state = _synth_paddle_state(entries, param_shapes, stat_shapes, rng)
    tree = convert_state(state, name, input_size, model_args=args)
    out = model.apply({"params": tree["params"]["backbone"],
                       "batch_stats": tree["batch_stats"]["backbone"]},
                      probe, train=False)
    assert out.shape == (2, args.get("embd_dim", 16))
    assert np.isfinite(np.asarray(out)).all()


def test_classifier_conversion():
    cls = SpeakerIdentification(num_speakers=10, num_blocks=1, inter_dim=8)
    emb = jnp.zeros((2, 16), jnp.float32)
    v = cls.init(jax.random.PRNGKey(0), emb, train=False)
    param_shapes = _flat_paths(v["params"])
    stat_shapes = _flat_paths(dict(v.get("batch_stats", {})))
    entries = spec_classifier(input_dim=16, num_speakers=10, num_blocks=1,
                              inter_dim=8)
    assert {f for (_, c, f, _, _) in entries if c == "params"} == set(param_shapes)
    rng = np.random.RandomState(2)
    state = {"1." + k: v for k, v in _synth_paddle_state(
        entries, param_shapes, stat_shapes, rng).items()}
    # backbone side: TDNN small
    bargs = SMALL["TDNN"]
    bspecs = SPECS["TDNN"](40, **bargs)
    bp, bs = _model_tree_shapes("TDNN", bargs, 40)
    state.update({"0." + k: v for k, v in _synth_paddle_state(
        bspecs, bp, bs, rng).items()})
    tree = convert_state(state, "TDNN", 40, model_args=bargs,
                         classifier_conf=dict(input_dim=16, num_speakers=10,
                                              num_blocks=1, inter_dim=8))
    got = _flat_paths(tree["params"]["classifier"])
    assert got == param_shapes


def test_unconsumed_keys_rejected():
    bargs = SMALL["TDNN"]
    bspecs = SPECS["TDNN"](40, **bargs)
    bp, bs = _model_tree_shapes("TDNN", bargs, 40)
    state = _synth_paddle_state(bspecs, bp, bs, np.random.RandomState(0))
    state["nonexistent.weight"] = np.zeros((3, 3), np.float32)
    with pytest.raises(KeyError):
        convert_state(state, "TDNN", 40, model_args=bargs)


# ---------------------------------------------------------------------------
# numerical layout validation (torch shares paddle's conv layouts)
# ---------------------------------------------------------------------------
def test_conv1d_transpose_convention_vs_torch():
    import torch
    import flax.linen as nn
    rng = np.random.RandomState(0)
    x = rng.randn(2, 31, 5).astype(np.float32)          # ours: (B, T, C)
    w = rng.randn(7, 5, 3).astype(np.float32)           # paddle: (out, in, k)
    b = rng.randn(7).astype(np.float32)
    ref = torch.nn.functional.conv1d(
        torch.tensor(x).permute(0, 2, 1), torch.tensor(w),
        torch.tensor(b)).permute(0, 2, 1).numpy()
    conv = nn.Conv(7, (3,), padding="VALID")
    out = conv.apply({"params": {"kernel": jnp.asarray(_t_conv1d(w)),
                                 "bias": jnp.asarray(b)}}, jnp.asarray(x))
    assert np.allclose(np.asarray(out), ref, atol=1e-4)


def test_conv2d_transpose_convention_vs_torch():
    import torch
    import flax.linen as nn
    rng = np.random.RandomState(0)
    x = rng.randn(2, 9, 11, 4).astype(np.float32)       # ours: NHWC
    w = rng.randn(6, 4, 3, 3).astype(np.float32)        # paddle: OIHW
    b = rng.randn(6).astype(np.float32)
    ref = torch.nn.functional.conv2d(
        torch.tensor(x).permute(0, 3, 1, 2), torch.tensor(w),
        torch.tensor(b), padding=1).permute(0, 2, 3, 1).numpy()
    conv = nn.Conv(6, (3, 3), padding=((1, 1), (1, 1)))
    out = conv.apply({"params": {"kernel": jnp.asarray(_t_conv2d(w)),
                                 "bias": jnp.asarray(b)}}, jnp.asarray(x))
    assert np.allclose(np.asarray(out), ref, atol=1e-4)


def test_flatten_permutation_semantics():
    """reference: NCHW (B,C,F,T) -> flatten (C,F) channel-major, then a
    [in,out] Linear. ours: NHWC (B,F,T,C) -> flatten (F,C) freq-major.
    Permuting the Linear's rows must give identical outputs."""
    rng = np.random.RandomState(0)
    B, C, F, T, E = 2, 6, 4, 5, 3
    x_nchw = rng.randn(B, C, F, T).astype(np.float32)
    w = rng.randn(C * F, E).astype(np.float32)          # paddle [in, out]

    # reference path: flatten (C,F) then mean over T then linear
    ref_flat = x_nchw.reshape(B, C * F, T).mean(-1)
    ref_out = ref_flat @ w

    # our path: NHWC, flatten (F,C)
    x_nhwc = np.transpose(x_nchw, (0, 2, 3, 1))         # (B,F,T,C)
    our_flat = np.transpose(x_nhwc, (0, 2, 1, 3)).reshape(B, T, F * C).mean(1)
    perm = _flatten_perm(F, C)
    our_out = our_flat @ np.take(w, perm, axis=0)
    assert np.allclose(our_out, ref_out, atol=1e-5)
