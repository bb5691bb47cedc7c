"""Speaker classifier head.

Parity with reference ``ppvector/models/fc.py:6-87``: optional dense
blocks, then a Cosine head — ``normalize(x) @ normalize(W, axis=0)`` with
weight shape ``(in_dim, num_speakers * K)`` (K sub-centers) — or a plain
Linear head. Returns ``{"features", "logits"}``.
"""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .layers import DenseBN

__all__ = ["SpeakerIdentification"]


class SpeakerIdentification(nn.Module):
    num_speakers: int
    classifier_type: str = "Cosine"
    K: int = 1
    num_blocks: int = 0
    inter_dim: int = 512
    dtype: Any = None

    @nn.compact
    def __call__(self, features, train: bool = False):
        x = features
        for _ in range(self.num_blocks):
            x = DenseBN(self.inter_dim, config_str="batchnorm")(x, train)

        if self.classifier_type == "Cosine":
            weight = self.param("weight", nn.initializers.xavier_uniform(),
                                (x.shape[-1], self.num_speakers * self.K))
            # cosine logits always in fp32: the margin losses derive
            # sin(theta) from sqrt(1-cos^2) — bf16 here would corrupt the
            # margin geometry, and this matmul is negligible compute
            x32 = x.astype(jnp.float32)
            x_n = x32 / jnp.maximum(
                jnp.linalg.norm(x32, axis=-1, keepdims=True), 1e-12)
            w_n = weight / jnp.maximum(
                jnp.linalg.norm(weight, axis=0, keepdims=True), 1e-12)
            logits = jnp.matmul(x_n, w_n)
        elif self.classifier_type == "Linear":
            logits = nn.Dense(self.num_speakers, dtype=self.dtype)(x)
        else:
            raise ValueError(f"unsupported classifier: {self.classifier_type}")

        return {"features": features, "logits": logits}
