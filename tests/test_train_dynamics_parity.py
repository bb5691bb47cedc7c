"""Training-DYNAMICS parity: the flax stack vs an independent torch
re-derivation, trained for N steps from identical weights and batches.

The strongest validation available without CN-Celeb/VoxCeleb (VERDICT r3
item 7): the torch forwards in ``test_torch_crosscheck.py`` — written
directly against the reference's paddle state-dict keys, sharing no code
with the flax implementation — are extended to TRAIN mode (batch-stat
BatchNorm), given the same Cosine-head + AAM loss re-derivation
(reference ``ppvector/models/fc.py:6-87`` + ``loss/aamloss.py``), and
stepped with torch.optim.Adam while the flax side runs the exact
bench/trainer step (flax apply + optax.adam). Per-step loss agreement
upgrades the architecture-parity story to training-dynamics parity:
forward, backward, BN batch statistics, margin-loss geometry, and Adam
all match.
"""

import math
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip(
    "torch", reason="cross-framework validation needs torch (CPU)")
import torch.nn.functional as tF  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.convert_paddle_checkpoint import SPECS, convert_state  # noqa: E402
from voiceprintrecognition_paddlepaddle_tpu.loss import AAMLoss  # noqa: E402
from voiceprintrecognition_paddlepaddle_tpu.models import MODELS  # noqa: E402
from voiceprintrecognition_paddlepaddle_tpu.models.fc import (  # noqa: E402
    SpeakerIdentification)

from test_convert_paddle import (_model_tree_shapes,  # noqa: E402
                                 _synth_paddle_state)
from test_torch_crosscheck import P, torch_campplus, torch_ecapa  # noqa: E402

pytestmark = pytest.mark.slow

MARGIN, SCALE, LR = 0.2, 32.0, 1e-3


class TrainP(P):
    """Train-mode accessor: BatchNorm normalizes by BATCH statistics
    (in-place running-stat update, momentum matching flax's 0.9), and
    every weight/bias leaf carries grad."""

    def __init__(self, state):
        super().__init__(state)
        for k, v in self.s.items():
            if not (k.endswith("._mean") or k.endswith("._variance")):
                v.requires_grad_(True)

    def bn(self, x, key):
        return tF.batch_norm(x, self(key + "._mean"),
                             self(key + "._variance"),
                             self(key + ".weight"), self(key + ".bias"),
                             training=True, momentum=0.1, eps=1e-5)

    def trainable(self):
        return [v for k, v in self.s.items()
                if not (k.endswith("._mean") or k.endswith("._variance"))]


def _torch_aam_head(emb, weight, labels, margin=MARGIN, scale=SCALE):
    """Cosine head + AAM loss, re-derived from reference ``fc.py`` +
    ``aamloss.py`` (no code shared with the flax implementation)."""
    x = emb / emb.norm(dim=-1, keepdim=True).clamp_min(1e-12)
    w = weight / weight.norm(dim=0, keepdim=True).clamp_min(1e-12)
    logits = x @ w
    cos_m, sin_m = math.cos(margin), math.sin(margin)
    th = math.cos(math.pi - margin)
    mmm = 1.0 + th
    sine = (1.0 - logits ** 2).clamp_min(0.0).sqrt()
    phi = logits * cos_m - sine * sin_m
    phi = torch.where(logits > th, phi, logits - mmm)
    one_hot = tF.one_hot(labels, logits.shape[-1]).to(logits.dtype)
    out = (one_hot * phi + (1.0 - one_hot) * logits) * scale
    return tF.cross_entropy(out, labels)


def _dynamics_parity(name, args, input_size, t_len, torch_fwd, n_steps=5,
                     batch=4, n_spk=8, seed=3):
    # ---- identical initial weights via the converter (the same flow the
    # forward cross-checks validate) ----
    param_shapes, stat_shapes = _model_tree_shapes(name, args, input_size)
    entries = SPECS[name](input_size, **args)
    rng = np.random.RandomState(seed)
    state = _synth_paddle_state(entries, param_shapes, stat_shapes, rng)
    tree = convert_state(state, name, input_size, model_args=args)
    emb_dim = args["embd_dim"]
    w_cls = (rng.randn(emb_dim, n_spk) / np.sqrt(emb_dim)).astype(np.float32)

    # identical batches for every step
    batches = [(rng.randn(batch, t_len, input_size).astype(np.float32),
                rng.randint(0, n_spk, size=batch).astype(np.int64))
               for _ in range(n_steps)]

    # ---- flax side: the bench/trainer train step ----
    import optax
    model = MODELS[name](input_size=input_size, **args)
    classifier = SpeakerIdentification(num_speakers=n_spk, num_blocks=0)
    criterion = AAMLoss(margin=MARGIN, scale=SCALE)
    tx = optax.adam(LR)
    params = {"backbone": tree["params"]["backbone"],
              "classifier": {"weight": jnp.asarray(w_cls)}}
    stats = {"backbone": tree["batch_stats"]["backbone"]}
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state, feats, labels):
        def loss_fn(p):
            emb, mb = model.apply(
                {"params": p["backbone"], "batch_stats": stats["backbone"]},
                feats, train=True, mutable=["batch_stats"])
            out = classifier.apply({"params": p["classifier"]},
                                   emb.astype(jnp.float32), train=False)
            return criterion(out, labels,
                             margin=jnp.float32(MARGIN)), mb["batch_stats"]

        (loss, new_bstats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates),
                {"backbone": new_bstats}, new_opt, loss)

    flax_losses = []
    for feats, labels in batches:
        params, stats, opt_state, loss = step(
            params, stats, opt_state, jnp.asarray(feats),
            jnp.asarray(labels))
        flax_losses.append(float(loss))

    # ---- torch side: independent re-derivation ----
    p = TrainP(state)
    w_t = torch.from_numpy(w_cls.copy()).requires_grad_(True)
    opt = torch.optim.Adam(p.trainable() + [w_t], lr=LR)
    torch_losses = []
    for feats, labels in batches:
        opt.zero_grad()
        emb = torch_fwd(p, torch.from_numpy(feats))
        loss = _torch_aam_head(emb, w_t, torch.from_numpy(labels))
        loss.backward()
        opt.step()
        torch_losses.append(float(loss))

    # per-step agreement: same losses => same grads/BN stats/Adam updates
    # accumulated over every preceding step
    for i, (lf, lt) in enumerate(zip(flax_losses, torch_losses)):
        assert abs(lf - lt) / max(abs(lt), 1e-6) < 2e-3, (
            i, flax_losses, torch_losses)
    # the curve must actually move (a frozen model would trivially agree)
    assert abs(flax_losses[-1] - flax_losses[0]) > 1e-4


def test_campplus_train_dynamics_match_torch():
    _dynamics_parity("CAMPPlus", dict(embd_dim=32), input_size=40,
                     t_len=250, torch_fwd=torch_campplus)


def test_ecapa_train_dynamics_match_torch():
    args = dict(channels=(32, 32, 32, 32, 96), res2net_scale=4,
                se_channels=16, attention_channels=16, embd_dim=16)
    _dynamics_parity("EcapaTdnn", args, input_size=40, t_len=120,
                     torch_fwd=lambda p, x: torch_ecapa(p, x, scale=4))
