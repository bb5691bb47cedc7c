"""ERes2Net / ERes2NetV2 backbones (enhanced Res2Net with attentional
feature fusion).

Parity with reference ``ppvector/models/eres2net.py:32-463``: four block
stages; 'fuse' stages replace the intra-block split additions with AFF
modules; V1 additionally fuses every stage bottom-up through downsample
convs + AFF (``eres2net.py:239-253``), V2 fuses only layer3→layer4
(``eres2net.py:442-453``). Activation is Hardtanh(0, 20). TSTP pooling,
Linear embedding. NHWC layout (B, F, T, C).
"""

import math
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import hardtanh_relu20
from .pooling import TemporalStatsPool

__all__ = ["ERes2Net", "ERes2NetV2"]


class _BN2d(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype)(x)


class AFF(nn.Module):
    """Attentional feature fusion: 1+tanh gated mix
    (reference ``eres2net.py:32-52``)."""
    channels: int
    r: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x, ds_y, train: bool = False):
        inter = self.channels // self.r
        xa = jnp.concatenate([x, ds_y], axis=-1)
        a = nn.Conv(inter, (1, 1), dtype=self.dtype)(xa)
        a = _BN2d(dtype=self.dtype)(a, train)
        a = nn.silu(a)
        a = nn.Conv(self.channels, (1, 1), dtype=self.dtype)(a)
        a = _BN2d(dtype=self.dtype)(a, train)
        a = 1.0 + jnp.tanh(a)
        return x * a + ds_y * (2.0 - a)


class _BasicBlock(nn.Module):
    """Covers all four reference block variants: ``use_aff`` switches the
    split-summation to AFF fusion; kernel-1 conv1 carries the stride.
    (reference ``eres2net.py:55-170, 266-380``)."""
    planes: int
    stride: int = 1
    base_width: int = 32
    scale: int = 2
    expansion: int = 2
    use_aff: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(math.floor(self.planes * (self.base_width / 64.0)))
        out = nn.Conv(width * self.scale, (1, 1), strides=(self.stride, self.stride),
                      dtype=self.dtype)(x)
        out = hardtanh_relu20(_BN2d(dtype=self.dtype)(out, train))

        spx = jnp.split(out, self.scale, axis=-1)
        ys = []
        sp = None
        for i in range(self.scale):
            if i == 0:
                sp = spx[i]
            elif self.use_aff:
                sp = AFF(width, dtype=self.dtype)(sp, spx[i], train)
            else:
                sp = sp + spx[i]
            sp = nn.Conv(width, (3, 3), padding=((1, 1), (1, 1)),
                         dtype=self.dtype)(sp)
            sp = hardtanh_relu20(_BN2d(dtype=self.dtype)(sp, train))
            ys.append(sp)
        out = jnp.concatenate(ys, axis=-1)

        out = nn.Conv(self.planes * self.expansion, (1, 1),
                      dtype=self.dtype)(out)
        out = _BN2d(dtype=self.dtype)(out, train)

        residual = x
        if self.stride != 1 or x.shape[-1] != self.planes * self.expansion:
            residual = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=(self.stride, self.stride),
                               dtype=self.dtype)(x)
            residual = _BN2d(dtype=self.dtype)(residual, train)
        return hardtanh_relu20(out + residual)


def _make_stage(x, train, planes, num_blocks, stride, base_width, scale,
                expansion, use_aff, dtype):
    strides = [stride] + [1] * (num_blocks - 1)
    for s in strides:
        x = _BasicBlock(planes, s, base_width, scale, expansion,
                        use_aff, dtype=dtype)(x, train)
    return x


class ERes2Net(nn.Module):
    input_size: int
    num_blocks: Sequence[int] = (3, 4, 6, 3)
    m_channels: int = 32
    mul_channel: int = 1
    expansion: int = 2
    base_width: int = 32
    scale: int = 2
    embd_dim: int = 192
    pooling_type: str = "TSTP"
    two_emb_layer: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, lengths=None):
        assert self.pooling_type == "TSTP", f"no pooling layer {self.pooling_type}"
        m, mc = self.m_channels, self.mul_channel
        x = x.transpose(0, 2, 1)[..., None]  # (B, F, T, 1)
        out = nn.Conv(m, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype)(x)
        out = nn.relu(_BN2d(dtype=self.dtype)(out, train))

        args = dict(base_width=self.base_width, scale=self.scale,
                    expansion=self.expansion, dtype=self.dtype)
        out1 = _make_stage(out, train, m, self.num_blocks[0], 1,
                           use_aff=False, **args)
        out2 = _make_stage(out1, train, m * 2, self.num_blocks[1], 2,
                           use_aff=False, **args)
        out1_ds = nn.Conv(m * 4 * mc, (3, 3), strides=(2, 2),
                          padding=((1, 1), (1, 1)), dtype=self.dtype)(out1)
        fuse12 = AFF(m * 4 * mc, dtype=self.dtype)(out2, out1_ds, train)
        out3 = _make_stage(out2, train, m * 4, self.num_blocks[2], 2,
                           use_aff=True, **args)
        fuse12_ds = nn.Conv(m * 8 * mc, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), dtype=self.dtype)(fuse12)
        fuse123 = AFF(m * 8 * mc, dtype=self.dtype)(out3, fuse12_ds, train)
        out4 = _make_stage(out3, train, m * 8, self.num_blocks[3], 2,
                           use_aff=True, **args)
        fuse123_ds = nn.Conv(m * 16 * mc, (3, 3), strides=(2, 2),
                             padding=((1, 1), (1, 1)), dtype=self.dtype)(fuse123)
        fuse1234 = AFF(m * 16 * mc, dtype=self.dtype)(out4, fuse123_ds, train)

        stats = TemporalStatsPool(dtype=self.dtype)(fuse1234, train, lengths)
        embed = nn.Dense(self.embd_dim, dtype=self.dtype)(stats)
        if self.two_emb_layer:
            out = nn.relu(embed)
            out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, dtype=self.dtype)(out)
            return nn.Dense(self.embd_dim, dtype=self.dtype)(out)
        return embed


class ERes2NetV2(nn.Module):
    input_size: int
    num_blocks: Sequence[int] = (3, 4, 6, 3)
    m_channels: int = 32
    expansion: int = 2
    base_width: int = 26
    scale: int = 2
    embd_dim: int = 192
    pooling_type: str = "TSTP"
    two_emb_layer: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, lengths=None):
        assert self.pooling_type == "TSTP", f"no pooling layer {self.pooling_type}"
        m = self.m_channels
        x = x.transpose(0, 2, 1)[..., None]
        out = nn.Conv(m, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype)(x)
        out = nn.relu(_BN2d(dtype=self.dtype)(out, train))

        args = dict(base_width=self.base_width, scale=self.scale,
                    expansion=self.expansion, dtype=self.dtype)
        out1 = _make_stage(out, train, m, self.num_blocks[0], 1,
                           use_aff=False, **args)
        out2 = _make_stage(out1, train, m * 2, self.num_blocks[1], 2,
                           use_aff=False, **args)
        out3 = _make_stage(out2, train, m * 4, self.num_blocks[2], 2,
                           use_aff=True, **args)
        out4 = _make_stage(out3, train, m * 8, self.num_blocks[3], 2,
                           use_aff=True, **args)
        out3_ds = nn.Conv(m * 16, (3, 3), strides=(2, 2),
                          padding=((1, 1), (1, 1)), dtype=self.dtype)(out3)
        fuse34 = AFF(m * 16, dtype=self.dtype)(out4, out3_ds, train)

        stats = TemporalStatsPool(dtype=self.dtype)(fuse34, train, lengths)
        embed = nn.Dense(self.embd_dim, dtype=self.dtype)(stats)
        if self.two_emb_layer:
            out = nn.relu(embed)
            out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, dtype=self.dtype)(out)
            return nn.Dense(self.embd_dim, dtype=self.dtype)(out)
        return embed
