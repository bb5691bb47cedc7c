"""SE-ResNet backbone (2-D).

Parity with reference ``ppvector/models/resnet_se.py:8-139``: 3x3 stem,
four SEBottleneck stages (expansion 2) with squeeze-excitation, then
(C·F) x T pooling and Linear→BN embedding. NHWC layout (B, F, T, C).
"""

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import BatchNorm1d
from .pooling import POOLINGS

__all__ = ["ResNetSE"]


class _BN2d(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype)(x)


class SELayer(nn.Module):
    """Global-pool squeeze-excitation (reference ``resnet_se.py:48-63``)."""
    reduction: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))
        y = nn.relu(nn.Dense(c // self.reduction, dtype=self.dtype)(y))
        y = nn.sigmoid(nn.Dense(c, dtype=self.dtype)(y))
        return x * y[:, None, None, :]


class SEBottleneck(nn.Module):
    """Reference ``resnet_se.py:8-45`` (expansion 2)."""
    planes: int
    stride: int = 1
    downsample: bool = False
    reduction: int = 8
    expansion: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.Conv(self.planes, (1, 1), dtype=self.dtype)(x)
        out = nn.relu(_BN2d(dtype=self.dtype)(out, train))
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), dtype=self.dtype)(out)
        out = nn.relu(_BN2d(dtype=self.dtype)(out, train))
        out = nn.Conv(self.planes * self.expansion, (1, 1),
                      dtype=self.dtype)(out)
        out = _BN2d(dtype=self.dtype)(out, train)
        out = SELayer(self.reduction, dtype=self.dtype)(out)

        residual = x
        if self.downsample:
            residual = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=(self.stride, self.stride),
                               dtype=self.dtype)(x)
            residual = _BN2d(dtype=self.dtype)(residual, train)
        return nn.relu(out + residual)


class ResNetSE(nn.Module):
    input_size: int
    layers: Sequence[int] = (3, 4, 6, 3)
    num_filters: Sequence[int] = (32, 64, 128, 256)
    embd_dim: int = 192
    pooling_type: str = "ASP"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, lengths=None):
        # (B, T, F) -> NHWC (B, F, T, 1)
        x = x.transpose(0, 2, 1)[..., None]
        x = nn.Conv(self.num_filters[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype)(x)
        x = nn.relu(_BN2d(dtype=self.dtype)(x, train))

        expansion = 2
        in_planes = self.num_filters[0]
        for stage, stride in enumerate((1, 2, 2, 2)):
            planes = self.num_filters[stage]
            need_ds = stride != 1 or in_planes != planes * expansion
            x = SEBottleneck(planes, stride, downsample=need_ds,
                             dtype=self.dtype)(x, train)
            in_planes = planes * expansion
            for _ in range(1, self.layers[stage]):
                x = SEBottleneck(planes, 1, dtype=self.dtype)(x, train)

        b, f, t, c = x.shape
        x = x.transpose(0, 2, 1, 3).reshape(b, t, f * c)
        if self.pooling_type not in POOLINGS:
            raise ValueError(f"no pooling layer {self.pooling_type}")
        x = POOLINGS[self.pooling_type](dtype=self.dtype)(x, train, lengths)
        x = BatchNorm1d(dtype=self.dtype)(x, train)
        x = nn.Dense(self.embd_dim, dtype=self.dtype)(x)
        return BatchNorm1d(dtype=self.dtype)(x, train)
