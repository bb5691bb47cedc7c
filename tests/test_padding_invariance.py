"""Padded-batch embeddings must match exact-length inference: masked CMN
(featurizer) + length-aware pooling (all backbones) make the embedding
padding-invariant up to conv edge effects — the reference pools over
padding and its embeddings drift (cos 0.80-0.95 at 2-4x padding)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy suite: excluded from the < 5-min fast tier

from voiceprintrecognition_paddlepaddle_tpu.models import MODELS
from voiceprintrecognition_paddlepaddle_tpu.ops.features import compute_feature

SR = 16000

SMALL = {
    "EcapaTdnn": dict(channels=(64, 64, 64, 64, 192), res2net_scale=4,
                      se_channels=32, attention_channels=32),
    "CAMPPlus": dict(growth_rate=8, bn_size=2, init_channels=32),
    "ERes2NetV2": dict(m_channels=8, num_blocks=(1, 1, 1, 1)),
    "TDNN": dict(channels=64),
    "ResNetSE": dict(layers=(1, 1, 1, 1), num_filters=(8, 8, 16, 16)),
}


@pytest.mark.parametrize("name", list(SMALL))
def test_embedding_padding_invariance(name):
    import jax
    rng = np.random.RandomState(0)
    t = np.arange(2 * SR) / SR
    wave = (0.3 * np.sin(2 * np.pi * 220 * t)
            + 0.05 * rng.randn(len(t))).astype(np.float32)

    m = MODELS[name](input_size=40, embd_dim=32, **SMALL[name])
    f_exact = compute_feature(wave[None], "Fbank", sr=SR, n_mels=40)
    v = m.init(jax.random.PRNGKey(0), f_exact, train=False)
    e_exact = np.asarray(m.apply(v, f_exact, train=False))[0]

    padded = np.zeros((1, 4 * len(wave)), np.float32)
    padded[0, :len(wave)] = wave
    ratio = np.array([0.25], np.float32)
    f_pad = compute_feature(padded, "Fbank", input_lens_ratio=ratio,
                            sr=SR, n_mels=40)
    e_pad = np.asarray(m.apply(v, f_pad, train=False, lengths=ratio))[0]
    cos = float(e_exact @ e_pad
                / (np.linalg.norm(e_exact) * np.linalg.norm(e_pad)))
    assert cos > 0.998, f"{name}: cos {cos}"
