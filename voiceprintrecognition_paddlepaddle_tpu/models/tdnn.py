"""x-vector TDNN backbone.

Parity with reference ``ppvector/models/tdnn.py:9-68``: five dilated valid
(unpadded) temporal convs — ReLU then BN after layers 1–4, ReLU only after
layer 5 — a pooling layer with BN, then Linear→BN to the embedding.
Channels-last (B, T, F) throughout.
"""

from typing import Any

import flax.linen as nn

from .layers import BatchNorm1d
from .pooling import POOLING_DIM_FACTOR, POOLINGS

__all__ = ["TDNN"]


class TDNN(nn.Module):
    input_size: int
    channels: int = 512
    embd_dim: int = 192
    pooling_type: str = "ASP"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, lengths=None):
        def conv(k, d):
            return nn.Conv(self.channels, (k,), kernel_dilation=(d,),
                           padding="VALID", dtype=self.dtype)

        x = BatchNorm1d(dtype=self.dtype)(nn.relu(conv(5, 1)(x)), train)
        x = BatchNorm1d(dtype=self.dtype)(nn.relu(conv(3, 2)(x)), train)
        x = BatchNorm1d(dtype=self.dtype)(nn.relu(conv(3, 3)(x)), train)
        x = BatchNorm1d(dtype=self.dtype)(nn.relu(conv(1, 1)(x)), train)
        x = nn.relu(conv(1, 1)(x))

        if self.pooling_type not in POOLING_DIM_FACTOR:
            raise ValueError(f"no pooling layer {self.pooling_type}")
        out = POOLINGS[self.pooling_type](dtype=self.dtype)(x, train, lengths)
        out = BatchNorm1d(dtype=self.dtype)(out, train)
        out = nn.Dense(self.embd_dim, dtype=self.dtype)(out)
        return BatchNorm1d(dtype=self.dtype)(out, train)
