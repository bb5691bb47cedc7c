"""Every backbone must trace with a SYMBOLIC batch AND time dimension —
the property behind ``Trainer.export(export_seconds=None)``'s single
length-polymorphic StableHLO artifact (one module serves every duration
bucket; reference serves one static graph per export,
``ppvector/trainer.py:449-474``).

``jax.export`` shape polymorphism rejects any Python arithmetic on
concrete dims (``math.ceil``, data-dependent branches), so this test
fails fast if a model edit reintroduces one. Pure tracing via
``jax.eval_shape`` — no compile, runs in seconds.
"""

import jax
import jax.numpy as jnp
import pytest

from voiceprintrecognition_paddlepaddle_tpu.models import MODELS
from voiceprintrecognition_paddlepaddle_tpu.ops.features import (
    compute_feature)

N_MELS = 40
SMALL_ARGS = {
    "EcapaTdnn": {"embd_dim": 16, "channels": (32, 32, 32, 32, 64)},
    "TDNN": {"embd_dim": 16, "channels": 32},
    "Res2Net": {"embd_dim": 16, "m_channels": 8},
    "ResNetSE": {"embd_dim": 16, "num_filters": [8, 8, 16, 16]},
    "ERes2Net": {"embd_dim": 16, "m_channels": 8},
    "ERes2NetV2": {"embd_dim": 16, "m_channels": 8},
    "CAMPPlus": {"embd_dim": 16, "init_channels": 16, "growth_rate": 8},
}


@pytest.mark.parametrize("name", sorted(MODELS))
def test_backbone_traces_with_symbolic_batch_and_time(name):
    model = MODELS[name](input_size=N_MELS, **SMALL_ARGS[name])
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((2, 64, N_MELS)), train=False))

    # f Kaldi frames <=> 160*f + 240 samples at 16 kHz (the export grid)
    b, f = jax.export.symbolic_shape("b, f", constraints=["f >= 10"])
    wave = jax.ShapeDtypeStruct((b, 160 * f + 240), jnp.float32)

    def forward(v, w):
        feats = compute_feature(w, "Fbank", use_pallas=False,
                                sr=16000, n_mels=N_MELS)
        return model.apply(v, feats, train=False)

    out = jax.eval_shape(forward, variables, wave)
    assert out.shape[0] == b and out.shape[1] == 16
