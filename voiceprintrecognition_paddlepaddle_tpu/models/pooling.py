"""Temporal pooling layers over (B, T, C) sequences.

Functional parity with reference ``ppvector/models/pooling.py:8-146`` —
TAP / TSP / SAP / ASP / TSTP — re-expressed channels-last. Variance uses
ddof=1 where the reference relies on paddle's unbiased default.

All poolings are length-aware: given ``lengths`` (valid-fraction per
sample), statistics are computed over valid frames only, so padded-batch
embeddings match exact-length inference (the reference pools over padding
and eats the resulting embedding drift). ``lengths=None`` reproduces the
reference's unmasked math exactly.
"""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .layers import SamePadConv1d, TDNNBlock, length_to_mask


def _time_mask(x_shape, lengths, dtype):
    """(B, T, 1) validity mask from per-sample valid fractions."""
    b, t = x_shape[0], x_shape[1]
    return length_to_mask(lengths * t, t).astype(dtype)[:, :, None]


def masked_mean_var(x, lengths, ddof=0):
    """Mean/variance over valid frames of (B, T, C); unmasked when
    lengths is None."""
    if lengths is None:
        return jnp.mean(x, axis=1), jnp.var(x, axis=1, ddof=ddof)
    mask = _time_mask(x.shape, lengths, x.dtype)
    n = jnp.maximum(jnp.sum(mask, axis=1), 1.0)
    mean = jnp.sum(x * mask, axis=1) / n
    var = jnp.sum(((x - mean[:, None, :]) ** 2) * mask, axis=1) / \
        jnp.maximum(n - ddof, 1.0)
    return mean, var

__all__ = ["TemporalAveragePooling", "TemporalStatisticsPooling",
           "SelfAttentivePooling", "AttentiveStatisticsPooling",
           "TemporalStatsPool", "POOLING_DIM_FACTOR"]

# output dim = factor * input channel dim
POOLING_DIM_FACTOR = {"TAP": 1, "SAP": 1, "TSP": 2, "ASP": 2, "TSTP": 2}


class TemporalAveragePooling(nn.Module):
    """TAP: mean over time (reference ``pooling.py:8-25``)."""
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, lengths=None):
        return masked_mean_var(x, lengths)[0]


class TemporalStatisticsPooling(nn.Module):
    """TSP: mean ‖ var over time (reference ``pooling.py:28-47``)."""
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, lengths=None):
        mean, var = masked_mean_var(x, lengths, ddof=1)
        return jnp.concatenate([mean, var], axis=-1)


class SelfAttentivePooling(nn.Module):
    """SAP: tanh-bottleneck attention weights, weighted mean
    (reference ``pooling.py:50-66``)."""
    bottleneck_dim: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, lengths=None):
        alpha = jnp.tanh(nn.Conv(self.bottleneck_dim, (1,), dtype=self.dtype)(x))
        alpha = nn.Conv(x.shape[-1], (1,), dtype=self.dtype)(alpha)
        if lengths is not None:
            mask = _time_mask(x.shape, lengths, x.dtype)
            alpha = jnp.where(mask == 0, -jnp.inf, alpha)
        alpha = nn.softmax(alpha, axis=1)
        return jnp.sum(alpha * x, axis=1)


class AttentiveStatisticsPooling(nn.Module):
    """ASP with optional global context (reference ``pooling.py:69-125``):
    masked global mean/std are tiled and concatenated with the input, a
    tanh TDNN bottleneck produces per-frame attention, padded frames are
    masked to -inf before the softmax, and attention-weighted mean ‖ std
    is returned."""
    attention_channels: int = 128
    global_context: bool = True
    dtype: Any = None
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x, train: bool = False, lengths=None):
        b, t, c = x.shape
        if lengths is None:
            lengths = jnp.ones((b,), dtype=x.dtype)
        mask = length_to_mask(lengths * t, t).astype(x.dtype)[:, :, None]  # (B,T,1)

        def _stats(x, m):
            mean = jnp.sum(m * x, axis=1)
            var = jnp.sum(m * (x - mean[:, None, :]) ** 2, axis=1)
            return mean, jnp.sqrt(jnp.maximum(var, self.eps))

        if self.global_context:
            total = jnp.sum(mask, axis=1, keepdims=True)
            mean, std = _stats(x, mask / total)
            mean = jnp.broadcast_to(mean[:, None, :], (b, t, c))
            std = jnp.broadcast_to(std[:, None, :], (b, t, c))
            attn = jnp.concatenate([x, mean, std], axis=-1)
        else:
            attn = x

        attn = TDNNBlock(self.attention_channels, 1, dtype=self.dtype)(attn, train)
        attn = SamePadConv1d(c, 1, dtype=self.dtype)(jnp.tanh(attn))
        attn = jnp.where(mask == 0, -jnp.inf, attn)
        attn = nn.softmax(attn, axis=1)
        mean, std = _stats(x, attn)
        return jnp.concatenate([mean, std], axis=-1)


class TemporalStatsPool(nn.Module):
    """TSTP: mean ‖ std over time, flattened (reference ``pooling.py:128-146``).

    Accepts (B, T, C) or NHWC (B, F, T, C); the 4-D case pools over T and
    flattens (F, C)."""
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, lengths=None):
        if x.ndim == 4:
            b, f, t, c = x.shape
            x = x.transpose(0, 2, 1, 3).reshape(b, t, f * c)
        mean, var = masked_mean_var(x, lengths, ddof=1)
        std = jnp.sqrt(var + 1e-8)
        return jnp.concatenate([mean, std], axis=-1)


POOLINGS = {
    "TAP": TemporalAveragePooling,
    "TSP": TemporalStatisticsPooling,
    "SAP": SelfAttentivePooling,
    "ASP": AttentiveStatisticsPooling,
    "TSTP": TemporalStatsPool,
}
