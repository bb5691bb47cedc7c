"""ECAPA-TDNN backbone.

Parity with reference ``ppvector/models/ecapa_tdnn.py:145-276``: initial
TDNN block, three SE-Res2Net blocks (dilations 2/3/4), multi-layer feature
aggregation over the SE-block outputs, an MFA TDNN block, pooling
(ASP/SAP/TAP/TSP) with BN, and a 1x1 projection to the embedding.
Channels-last (B, T, C); mask-aware paths are kept (``lengths`` is a ratio
in (0, 1], as in the reference).
"""

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import BatchNorm1d, SamePadConv1d, TDNNBlock, length_to_mask
from .pooling import POOLINGS

__all__ = ["EcapaTdnn"]


class Res2NetBlock(nn.Module):
    """Hierarchical multi-scale temporal convs
    (reference ``ecapa_tdnn.py:11-47``)."""
    out_channels: int
    scale: int = 8
    dilation: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert x.shape[-1] % self.scale == 0
        assert self.out_channels % self.scale == 0
        hidden = self.out_channels // self.scale
        chunks = jnp.split(x, self.scale, axis=-1)
        y = []
        for i, x_i in enumerate(chunks):
            if i == 0:
                y_i = x_i
            elif i == 1:
                y_i = TDNNBlock(hidden, 3, dilation=self.dilation,
                                dtype=self.dtype)(x_i, train)
            else:
                y_i = TDNNBlock(hidden, 3, dilation=self.dilation,
                                dtype=self.dtype)(x_i + y_i, train)
            y.append(y_i)
        return jnp.concatenate(y, axis=-1)


class SEBlock(nn.Module):
    """Mask-aware squeeze-excitation (reference ``ecapa_tdnn.py:50-82``)."""
    se_channels: int
    out_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, lengths=None):
        t = x.shape[1]
        if lengths is not None:
            mask = length_to_mask(lengths * t, t).astype(x.dtype)[:, :, None]
            total = jnp.sum(mask, axis=1, keepdims=True)
            s = jnp.sum(x * mask, axis=1, keepdims=True) / total
        else:
            s = jnp.mean(x, axis=1, keepdims=True)
        s = nn.relu(SamePadConv1d(self.se_channels, 1, dtype=self.dtype)(s))
        s = nn.sigmoid(SamePadConv1d(self.out_channels, 1, dtype=self.dtype)(s))
        return s * x


class SERes2NetBlock(nn.Module):
    """TDNN → Res2Net → TDNN → SE with residual
    (reference ``ecapa_tdnn.py:85-142``)."""
    out_channels: int
    res2net_scale: int = 8
    se_channels: int = 128
    kernel_size: int = 1
    dilation: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, lengths=None):
        residual = x
        if x.shape[-1] != self.out_channels:
            residual = SamePadConv1d(self.out_channels, 1, dtype=self.dtype)(x)
        x = TDNNBlock(self.out_channels, 1, dtype=self.dtype)(x, train)
        x = Res2NetBlock(self.out_channels, self.res2net_scale,
                         self.dilation, dtype=self.dtype)(x, train)
        x = TDNNBlock(self.out_channels, 1, dtype=self.dtype)(x, train)
        x = SEBlock(self.se_channels, self.out_channels,
                    dtype=self.dtype)(x, train, lengths)
        return x + residual


class EcapaTdnn(nn.Module):
    input_size: int
    embd_dim: int = 192
    pooling_type: str = "ASP"
    channels: Sequence[int] = (512, 512, 512, 512, 1536)
    kernel_sizes: Sequence[int] = (5, 3, 3, 3, 1)
    dilations: Sequence[int] = (1, 2, 3, 4, 1)
    attention_channels: int = 128
    res2net_scale: int = 8
    se_channels: int = 128
    global_context: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, lengths=None):
        ch, ks, dil = self.channels, self.kernel_sizes, self.dilations
        assert len(ch) == len(ks) == len(dil)

        x = TDNNBlock(ch[0], ks[0], dil[0], dtype=self.dtype)(x, train)
        xl = []
        for i in range(1, len(ch) - 1):
            x = SERes2NetBlock(ch[i], self.res2net_scale, self.se_channels,
                               ks[i], dil[i], dtype=self.dtype)(x, train, lengths)
            xl.append(x)

        # multi-layer feature aggregation (reference ``ecapa_tdnn.py:266``)
        x = jnp.concatenate(xl, axis=-1)
        x = TDNNBlock(ch[-1], ks[-1], dil[-1], dtype=self.dtype)(x, train)

        pt = self.pooling_type
        if pt == "ASP":
            pool = POOLINGS["ASP"](attention_channels=self.attention_channels,
                                   global_context=self.global_context,
                                   dtype=self.dtype)
        elif pt in ("SAP", "TAP", "TSP"):
            pool = POOLINGS[pt](dtype=self.dtype)
        else:
            raise ValueError(f"no pooling layer {pt}")
        x = pool(x, train, lengths)
        x = BatchNorm1d(dtype=self.dtype)(x, train)
        return SamePadConv1d(self.embd_dim, 1, dtype=self.dtype)(x[:, None, :])[:, 0, :]
