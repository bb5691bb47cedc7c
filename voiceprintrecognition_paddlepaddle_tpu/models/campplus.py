"""CAM++ backbone (context-aware masking densely-connected TDNN).

Parity with reference ``ppvector/models/campplus.py:284-335``: an ``FCM``
2-D residual front-end downsampling frequency by 8, a stride-2 TDNN stem,
three CAM-dense blocks (12/24/16 layers, growth 32) with transit halvings,
stats pooling (mean ‖ unbiased std) and a dense embedding layer.
Layouts: FCM runs NHWC (B, F, T, C); the x-vector trunk runs (B, T, C).
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import DenseBN

__all__ = ["CAMPPlus"]

class SDConv(nn.Module):
    """``nn.Conv(features, (3, 3), strides=(stride, 1),
    padding=((1, 1), (1, 1)))`` on NHWC ``(B, F, T, C)`` with an explicit
    param tree (``kernel``/``bias``) the checkpoint converter targets.

    History: through round 3 this module could dispatch to a
    space-to-depth Pallas conv with custom VJP (``pallas_conv2d.py``,
    ~2x useful MXU occupancy vs XLA's Cout 32->128 padding). Deleted in
    round 4: device-measured on v5e (tools/train_bench.py CAMPPlus b256
    bf16) the per-conv ops ran the train step at 151.0 ms vs 84.3 ms for
    lax — the per-call space-to-depth relayouts and batch-grid wgrad
    accumulation swamp the occupancy win that makes the FUSED inference
    kernel (models/pallas_fcm.py) faster on long buckets. See ROADMAP.md
    "Measured decisions"."""
    features: int
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,))
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        y = jax.lax.conv_general_dilated(
            x, kernel, (self.stride, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias


class _NonLinear(nn.Module):
    """BN/ReLU/PReLU stack (reference ``campplus.py:8-21``)."""
    config_str: str = "batchnorm-relu"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
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


class TDNNLayer(nn.Module):
    """conv1d → nonlinear (reference ``campplus.py:38-64``)."""
    features: int
    kernel_size: int
    stride: int = 1
    padding: int = -1
    dilation: int = 1
    use_bias: bool = False
    config_str: str = "batchnorm-relu"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.padding
        if pad < 0:
            assert self.kernel_size % 2 == 1
            pad = (self.kernel_size - 1) // 2 * self.dilation
        x = nn.Conv(self.features, (self.kernel_size,), strides=(self.stride,),
                    kernel_dilation=(self.dilation,), padding=((pad, pad),),
                    use_bias=True, dtype=self.dtype)(x)
        return _NonLinear(self.config_str, dtype=self.dtype)(x, train)


class CAMLayer(nn.Module):
    """Context-aware mask: local conv gated by a sigmoid MLP of
    global-mean + segment-pooled context (reference ``campplus.py:67-106``)."""
    bn_channels: int
    out_channels: int
    kernel_size: int
    stride: int
    padding: int
    dilation: int
    reduction: int = 2
    seg_len: int = 100
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.out_channels, (self.kernel_size,),
                    strides=(self.stride,), kernel_dilation=(self.dilation,),
                    padding=((self.padding, self.padding),),
                    dtype=self.dtype)(x)
        context = jnp.mean(x, axis=1, keepdims=True) + self._seg_pooling(x)
        context = nn.relu(nn.Conv(self.bn_channels // self.reduction, (1,),
                                  dtype=self.dtype)(context))
        m = nn.sigmoid(nn.Conv(self.out_channels, (1,),
                               dtype=self.dtype)(context))
        return y * m

    def _seg_pooling(self, x):
        """ceil-mode avg pool over time then nearest-repeat back to T
        (reference ``campplus.py:96-106``).

        Written in dim-expression-safe arithmetic (``-(-t // n)`` instead of
        ``math.ceil``, counts built from an iota comparison) so the module
        also traces with a *symbolic* time dimension for the
        length-polymorphic StableHLO export path."""
        b, t, c = x.shape
        n_segs = -(-t // self.seg_len)
        pad = n_segs * self.seg_len - t
        # ceil_mode avg pool: mean over actual (unpadded) elements per segment
        x_pad = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        sums = x_pad.reshape(b, n_segs, self.seg_len, c).sum(axis=2)
        # every segment holds seg_len frames except a short final one
        last = self.seg_len - pad
        counts = jnp.where(
            jax.lax.iota(jnp.int32, n_segs) < n_segs - 1,
            jnp.asarray(self.seg_len, x.dtype),
            jnp.asarray(last, x.dtype))
        seg = sums / counts[None, :, None]
        seg = jnp.repeat(seg, self.seg_len, axis=1)[:, :t, :]
        return seg


class CAMDenseTDNNLayer(nn.Module):
    """BN-function bottleneck + CAM conv (reference ``campplus.py:109-142``)."""
    out_channels: int
    bn_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    config_str: str = "batchnorm-relu"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.kernel_size % 2 == 1
        padding = (self.kernel_size - 1) // 2 * self.dilation
        x = _NonLinear(self.config_str, dtype=self.dtype)(x, train)
        x = nn.Conv(self.bn_channels, (1,), dtype=self.dtype)(x)
        x = _NonLinear(self.config_str, dtype=self.dtype)(x, train)
        return CAMLayer(self.bn_channels, self.out_channels, self.kernel_size,
                        self.stride, padding, self.dilation,
                        dtype=self.dtype)(x, train)


class CAMDenseTDNNBlock(nn.Module):
    """Densely-connected CAM layers (reference ``campplus.py:145-173``)."""
    num_layers: int
    out_channels: int
    bn_channels: int
    kernel_size: int
    dilation: int = 1
    config_str: str = "batchnorm-relu"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(self.num_layers):
            y = CAMDenseTDNNLayer(self.out_channels, self.bn_channels,
                                  self.kernel_size, dilation=self.dilation,
                                  config_str=self.config_str,
                                  dtype=self.dtype)(x, train)
            x = jnp.concatenate([x, y], axis=-1)
        return x


class BasicResBlock(nn.Module):
    """2-D residual block, frequency-only stride
    (reference ``campplus.py:211-243``). NHWC (B, F, T, C)."""
    planes: int
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                  epsilon=1e-5, dtype=self.dtype)
        # explicit names keep the nn.Conv-era param tree (Conv_0/1/2)
        out = SDConv(self.planes, stride=self.stride, dtype=self.dtype,
                     name="Conv_0")(x)
        out = nn.relu(bn()(out))
        out = SDConv(self.planes, dtype=self.dtype, name="Conv_1")(out)
        out = bn()(out)
        shortcut = x
        if self.stride != 1 or x.shape[-1] != self.planes:
            shortcut = nn.Conv(self.planes, (1, 1), strides=(self.stride, 1),
                               dtype=self.dtype, name="Conv_2")(x)
            shortcut = bn()(shortcut)
        return nn.relu(out + shortcut)


class FCM(nn.Module):
    """2-D conv front-end: freq / 8, channels m (reference
    ``campplus.py:246-281``). In: (B, T, F); out: (B, T, m*ceil(F/8))."""
    m_channels: int = 32
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                  epsilon=1e-5, dtype=self.dtype)
        # (B, T, F) -> NHWC (B, F, T, 1)
        x = x.transpose(0, 2, 1)[..., None]
        out = nn.relu(bn()(nn.Conv(self.m_channels, (3, 3),
                                   padding=((1, 1), (1, 1)),
                                   dtype=self.dtype)(x)))
        # two residual stages of [stride-2, stride-1] blocks (freq only)
        out = BasicResBlock(self.m_channels, stride=2, dtype=self.dtype)(out, train)
        out = BasicResBlock(self.m_channels, stride=1, dtype=self.dtype)(out, train)
        out = BasicResBlock(self.m_channels, stride=2, dtype=self.dtype)(out, train)
        out = BasicResBlock(self.m_channels, stride=1, dtype=self.dtype)(out, train)
        out = nn.relu(bn()(SDConv(self.m_channels, stride=2,
                                  dtype=self.dtype, name="Conv_1")(out)))
        b, f, t, c = out.shape
        # (B, F', T, C) -> (B, T, F'*C)
        return out.transpose(0, 2, 1, 3).reshape(b, t, f * c)


class CAMPPlus(nn.Module):
    input_size: int
    embd_dim: int = 512
    growth_rate: int = 32
    bn_size: int = 4
    init_channels: int = 128
    config_str: str = "batchnorm-relu"
    memory_efficient: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, lengths=None):
        x = FCM(dtype=self.dtype)(x, train)
        x = TDNNLayer(self.init_channels, 5, stride=2, dilation=1, padding=-1,
                      config_str=self.config_str, dtype=self.dtype)(x, train)
        channels = self.init_channels
        for num_layers, kernel_size, dilation in zip((12, 24, 16), (3, 3, 3),
                                                     (1, 2, 2)):
            x = CAMDenseTDNNBlock(num_layers, self.growth_rate,
                                  self.bn_size * self.growth_rate,
                                  kernel_size, dilation,
                                  config_str=self.config_str,
                                  dtype=self.dtype)(x, train)
            channels += num_layers * self.growth_rate
            # transit layer halves channels (reference ``campplus.py:176-189``;
            # note its ``bias=False`` arg is ignored there — the conv has bias)
            x = _NonLinear(self.config_str, dtype=self.dtype)(x, train)
            x = nn.Conv(channels // 2, (1,), dtype=self.dtype)(x)
            channels //= 2
        x = _NonLinear(self.config_str, dtype=self.dtype)(x, train)
        # stats pooling: mean ‖ unbiased std (reference ``campplus.py:24-35``);
        # length-aware under padding (see models/pooling.py docstring)
        from .pooling import masked_mean_var
        mean, var = masked_mean_var(x, lengths, ddof=1)
        std = jnp.sqrt(jnp.maximum(var, 0.0))
        stats = jnp.concatenate([mean, std], axis=-1)
        return DenseBN(self.embd_dim, config_str="batchnorm_",
                       dtype=self.dtype)(stats, train)
