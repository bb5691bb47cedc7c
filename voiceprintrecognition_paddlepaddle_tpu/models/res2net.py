"""Res2Net backbone (2-D, on the spectrogram as an image).

Parity with reference ``ppvector/models/res2net.py:11-167``: 7x7 stride-3
stem + 3x3 stride-2 max pool, four Bottle2neck stages (split-scale
hierarchical 3x3 convs, expansion 4, 'stage' blocks average-pool their last
split), then (C·F) x T pooling and Linear→BN embedding.
NHWC layout (B, F, T, C).
"""

import math
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import BatchNorm1d, avg_pool_exclusive
from .pooling import POOLINGS

__all__ = ["Res2Net"]


class _BN2d(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype)(x)


class Bottle2neck(nn.Module):
    """Reference ``res2net.py:11-87``."""
    planes: int
    stride: int = 1
    base_width: int = 26
    scale: int = 4
    stype: str = "normal"
    downsample: bool = False
    expansion: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(math.floor(self.planes * (self.base_width / 64.0)))
        nums = 1 if self.scale == 1 else self.scale - 1

        out = nn.Conv(width * self.scale, (1, 1), dtype=self.dtype)(x)
        out = nn.relu(_BN2d(dtype=self.dtype)(out, train))

        spx = jnp.split(out, self.scale, axis=-1)
        ys = []
        sp = None
        for i in range(nums):
            sp = spx[i] if (i == 0 or self.stype == "stage") else sp + spx[i]
            sp = nn.Conv(width, (3, 3), strides=(self.stride, self.stride),
                         padding=((1, 1), (1, 1)), dtype=self.dtype)(sp)
            sp = nn.relu(_BN2d(dtype=self.dtype)(sp, train))
            ys.append(sp)
        if self.scale != 1 and self.stype == "normal":
            ys.append(spx[nums])
        elif self.scale != 1 and self.stype == "stage":
            ys.append(avg_pool_exclusive(spx[nums], (3, 3),
                                         (self.stride, self.stride),
                                         ((1, 1), (1, 1))))
        out = jnp.concatenate(ys, axis=-1)

        out = nn.Conv(self.planes * self.expansion, (1, 1),
                      dtype=self.dtype)(out)
        out = _BN2d(dtype=self.dtype)(out, train)

        residual = x
        if self.downsample:
            residual = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=(self.stride, self.stride),
                               dtype=self.dtype)(x)
            residual = _BN2d(dtype=self.dtype)(residual, train)
        return nn.relu(out + residual)


class Res2Net(nn.Module):
    input_size: int
    m_channels: int = 32
    layers: Sequence[int] = (3, 4, 6, 3)
    base_width: int = 32
    scale: int = 2
    embd_dim: int = 192
    pooling_type: str = "ASP"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, lengths=None):
        # (B, T, F) -> NHWC (B, F, T, 1)
        x = x.transpose(0, 2, 1)[..., None]
        x = nn.Conv(self.m_channels, (7, 7), strides=(3, 3),
                    padding=((1, 1), (1, 1)), dtype=self.dtype)(x)
        x = nn.relu(_BN2d(dtype=self.dtype)(x, train))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        expansion = 4
        in_planes = self.m_channels
        for stage, (planes_mul, stride) in enumerate(
                zip((1, 2, 4, 8), (1, 2, 2, 2))):
            planes = self.m_channels * planes_mul
            blocks = self.layers[stage]
            need_ds = stride != 1 or in_planes != planes * expansion
            x = Bottle2neck(planes, stride, self.base_width, self.scale,
                            stype="stage", downsample=need_ds,
                            dtype=self.dtype)(x, train)
            in_planes = planes * expansion
            for _ in range(1, blocks):
                x = Bottle2neck(planes, 1, self.base_width, self.scale,
                                dtype=self.dtype)(x, train)

        # (B, F', T', C) -> (B, T', F'*C)
        b, f, t, c = x.shape
        x = x.transpose(0, 2, 1, 3).reshape(b, t, f * c)
        if self.pooling_type not in POOLINGS:
            raise ValueError(f"no pooling layer {self.pooling_type}")
        x = POOLINGS[self.pooling_type](dtype=self.dtype)(x, train, lengths)
        x = BatchNorm1d(dtype=self.dtype)(x, train)
        x = nn.Dense(self.embd_dim, dtype=self.dtype)(x)
        return BatchNorm1d(dtype=self.dtype)(x, train)
