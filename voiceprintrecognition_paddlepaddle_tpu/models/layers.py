"""Shared model building blocks (Flax).

TPU-first layout conventions (not a translation of the reference's
channels-first modules):

- 1-D (temporal) tensors are ``(B, T, C)`` — XLA's preferred NWC layout;
- 2-D (spectro-temporal) tensors are ``(B, F, T, C)`` — NHWC with H=freq.

Functionality mirrors reference ``ppvector/models/utils.py:8-148``:
``length_to_mask``, reflect same-padding Conv1d, BatchNorm wrapper and the
conv→act→BN ``TDNNBlock``. BatchNorm uses the reference's momentum 0.9 /
eps 1e-5 (``models/utils.py:96-119``).
"""

from typing import Any, Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["length_to_mask", "SamePadConv1d", "BatchNorm1d", "TDNNBlock",
           "avg_pool_exclusive", "hardtanh_relu20", "DenseBN"]


def length_to_mask(lengths, max_len):
    """``(B,) lengths -> (B, max_len)`` boolean mask
    (reference ``models/utils.py:8-19``)."""
    idx = jnp.arange(max_len)[None, :]
    return idx < lengths[:, None]


def hardtanh_relu20(x):
    """ERes2Net's ReLU: Hardtanh(0, 20) (reference ``eres2net.py:12-19``)."""
    return jnp.clip(x, 0.0, 20.0)


class SamePadConv1d(nn.Module):
    """Conv over time on (B, T, C) with the reference's 'same' padding in
    reflect mode (reference ``models/utils.py:22-93``)."""
    features: int
    kernel_size: int
    dilation: int = 1
    stride: int = 1
    groups: int = 1
    use_bias: bool = True
    padding_mode: str = "reflect"
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        k, d, s = self.kernel_size, self.dilation, self.stride
        if s > 1:
            pad = (k // 2, k // 2)
        else:
            l_in = x.shape[1]
            l_out = (l_in - d * (k - 1) - 1) // s + 1
            p = (l_in - l_out) // 2
            pad = (p, p)
        if pad != (0, 0):
            x = jnp.pad(x, ((0, 0), pad, (0, 0)), mode=self.padding_mode)
        return nn.Conv(self.features, (k,), strides=(s,), kernel_dilation=(d,),
                       feature_group_count=self.groups, padding="VALID",
                       use_bias=self.use_bias, dtype=self.dtype)(x)


class BatchNorm1d(nn.Module):
    """BatchNorm with reference momentum/eps over the channel (last) axis."""
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype)(x)


class TDNNBlock(nn.Module):
    """conv → activation → BN (reference ``models/utils.py:122-148``)."""
    features: int
    kernel_size: int
    dilation: int = 1
    activation: Callable = nn.relu
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = SamePadConv1d(self.features, self.kernel_size,
                          dilation=self.dilation, dtype=self.dtype)(x)
        x = self.activation(x)
        return BatchNorm1d(dtype=self.dtype)(x, train)


class DenseBN(nn.Module):
    """1x1 linear + configurable nonlinearity stack, the ``get_nonlinear``
    pattern shared by the classifier head and CAM++
    (reference ``models/fc.py:56-87``, ``models/campplus.py:8-21``)."""
    features: int
    config_str: str = "batchnorm-relu"
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.features, use_bias=self.use_bias, dtype=self.dtype)(x)
        for name in self.config_str.split("-"):
            if name == "relu":
                x = nn.relu(x)
            elif name in ("batchnorm", "batchnorm_"):
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype)(x)
            elif name == "prelu":
                a = self.param("prelu_alpha", nn.initializers.constant(0.25),
                               (x.shape[-1],))
                x = jnp.where(x >= 0, x, a * x)
            else:
                raise ValueError(f"Unexpected module ({name}).")
        return x


def avg_pool_exclusive(x, window, strides, padding):
    """2-D average pool over (F, T) of NHWC input that *excludes* padding
    from the divisor, matching paddle's ``AvgPool2D(exclusive=True)``.

    Uses ``lax.reduce_window`` with ``lax.add`` (the monoid form with a
    transpose rule — the generic reduce_window is not reverse-mode
    differentiable)."""
    import jax

    dims = (1,) + window + (1,)
    strides = (1,) + strides + (1,)
    pads = ((0, 0),) + padding + ((0, 0),)
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, strides, pads)
    ones = jnp.ones(x.shape[:-1] + (1,), dtype=x.dtype)
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, dims, strides,
                                   pads)
    return summed / counts
