"""Cross-framework numerical validation of backbone architectures.

An independent *functional torch* re-derivation of the reference forward
pass (read from ``/root/reference/ppvector/models/campplus.py:284-335`` /
``ecapa_tdnn.py:145-276`` and written here directly against the paddle
state-dict keys — no modules, no shared code with either the reference or
the flax implementation) is fed the exact same synthetic paddle-layout
weights that ``tools/convert_paddle_checkpoint.py`` converts into the flax
tree. Agreement of the two forwards validates, in one shot:

- the flax architecture wiring (dilations, shortcuts, gating, pooling),
- every converter layout convention (OIK/OIHW transposes, the NCHW
  channel-major flatten permutation, BN stat mapping),
- inference-mode BN semantics (eps, running stats).

torch shares paddle's conv weight layouts (OIK / OIHW) and its
``F.batch_norm`` inference semantics, so paddle tensors load verbatim.
"""

import math
import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy suite: excluded from the < 5-min fast tier

torch = pytest.importorskip(
    "torch", reason="cross-framework validation needs torch (CPU)")
import torch.nn.functional as tF  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.convert_paddle_checkpoint import SPECS, convert_state
from voiceprintrecognition_paddlepaddle_tpu.models import MODELS

from test_convert_paddle import (_flat_paths, _model_tree_shapes,
                                 _synth_paddle_state)


# ---------------------------------------------------------------------------
# torch functional primitives over the paddle state dict
# ---------------------------------------------------------------------------
class P:
    """Paddle-key accessor returning torch tensors."""

    def __init__(self, state):
        self.s = {k: torch.from_numpy(np.asarray(v, np.float32)) for k, v in
                  state.items()}

    def __call__(self, key):
        return self.s[key]

    def conv1d(self, x, key, stride=1, pad=0, dil=1):
        return tF.conv1d(x, self(key + ".weight"), self(key + ".bias"),
                         stride=stride, padding=pad, dilation=dil)

    def conv2d(self, x, key, stride=1, pad=1):
        return tF.conv2d(x, self(key + ".weight"), self(key + ".bias"),
                         stride=stride, padding=pad)

    def bn(self, x, key):
        return tF.batch_norm(x, self(key + "._mean"),
                             self(key + "._variance"),
                             self(key + ".weight"), self(key + ".bias"),
                             training=False, eps=1e-5)


def _seg_pool(x, seg_len=100):
    """ceil-mode average pooling over actual elements, repeated back to T
    (reference ``campplus.py:96-106``)."""
    b, c, t = x.shape
    n = math.ceil(t / seg_len)
    xp = tF.pad(x, (0, n * seg_len - t))
    sums = xp.reshape(b, c, n, seg_len).sum(-1)
    counts = torch.full((n,), float(seg_len))
    counts[-1] = t - (n - 1) * seg_len
    seg = sums / counts
    return seg.repeat_interleave(seg_len, dim=-1)[..., :t]


def torch_campplus(p, x, num_layers=(12, 24, 16), dilations=(1, 2, 2)):
    """(B, T, F) -> (B, embd). Reference ``campplus.py:284-335``."""
    x = x.transpose(1, 2).unsqueeze(1)                     # (B,1,F,T)
    out = torch.relu(p.bn(p.conv2d(x, "head.conv1"), "head.bn1"))
    for stage in (1, 2):
        for b, s in enumerate((2, 1)):
            k = f"head.layer{stage}.{b}"
            o = torch.relu(p.bn(p.conv2d(out, k + ".conv1", stride=(s, 1)),
                                k + ".bn1"))
            o = p.bn(p.conv2d(o, k + ".conv2"), k + ".bn2")
            sc = out if s == 1 else p.bn(
                p.conv2d(out, k + ".shortcut.0", stride=(s, 1), pad=0),
                k + ".shortcut.1")
            out = torch.relu(o + sc)
    out = torch.relu(p.bn(p.conv2d(out, "head.conv2", stride=(2, 1)),
                          "head.bn2"))
    bsz, c, f, t = out.shape
    x = out.reshape(bsz, c * f, t)                         # channel-major

    x = p.conv1d(x, "xvector.tdnn.linear", stride=2, pad=2)
    x = torch.relu(p.bn(x, "xvector.tdnn.nonlinear.batchnorm"))
    for bi, (nl, dil) in enumerate(zip(num_layers, dilations)):
        for li in range(nl):
            k = f"xvector.block{bi + 1}.tdnnd{li + 1}"
            h = p.conv1d(torch.relu(p.bn(x, k + ".nonlinear1.batchnorm")),
                         k + ".linear1")
            h = torch.relu(p.bn(h, k + ".nonlinear2.batchnorm"))
            y = p.conv1d(h, k + ".cam_layer.linear_local", pad=dil, dil=dil)
            ctx = h.mean(-1, keepdim=True) + _seg_pool(h)
            ctx = torch.relu(p.conv1d(ctx, k + ".cam_layer.linear1"))
            gate = torch.sigmoid(p.conv1d(ctx, k + ".cam_layer.linear2"))
            x = torch.cat([x, y * gate], dim=1)
        tk = f"xvector.transit{bi + 1}"
        x = p.conv1d(torch.relu(p.bn(x, tk + ".nonlinear.batchnorm")),
                     tk + ".linear")
    x = torch.relu(p.bn(x, "xvector.out_nonlinear.batchnorm"))
    stats = torch.cat([x.mean(-1), x.std(-1, unbiased=True)], dim=-1)
    e = p.conv1d(stats.unsqueeze(-1), "xvector.dense.linear").squeeze(-1)
    return p.bn(e, "xvector.dense.nonlinear.batchnorm")


# ---------------------------------------------------------------------------
# EcapaTdnn (reference ``ecapa_tdnn.py:145-276``)
# ---------------------------------------------------------------------------
def _tdnn_block(p, x, key, stride=1, pad=0, dil=1):
    """Conv1d (reflect same-pad) -> relu -> BN (reference
    ``models/utils.py:122-148``; Conv pads reflect to 'same')."""
    k = p(key + ".conv.conv.weight").shape[-1]
    if pad == "same":
        total = dil * (k - 1)
        left, right = total // 2, total - total // 2
        x = tF.pad(x, (left, right), mode="reflect")
    x = tF.conv1d(x, p(key + ".conv.conv.weight"),
                  p(key + ".conv.conv.bias"), stride=stride, dilation=dil)
    x = torch.relu(x)
    return p.bn(x, key + ".norm.norm")


def torch_ecapa(p, x, channels=512, dilations=(2, 3, 4), scale=8):
    """(B, T, F) -> (B, embd). Reference ``ecapa_tdnn.py:245-276``."""
    x = x.transpose(1, 2)                                  # (B, F, T)
    xl = [_tdnn_block(p, x, "blocks.0", pad="same")]
    for i, dil in enumerate(dilations, start=1):
        y = xl[-1]
        # SERes2NetBlock: tdnn1 -> res2net -> tdnn2 -> SE, + residual
        k = f"blocks.{i}"
        h = _tdnn_block(p, y, k + ".tdnn1", pad="same")
        # Res2NetBlock: split into `scale` chunks, hierarchical k3 convs
        chunks = torch.chunk(h, scale, dim=1)
        outs = [chunks[0]]
        for j in range(1, scale):
            inp = chunks[j] if j == 1 else inp + chunks[j]
            inp = _tdnn_block(p, inp, k + f".res2net_block.blocks.{j - 1}",
                              pad="same", dil=dil)
            outs.append(inp)
        h = torch.cat(outs, dim=1)
        h = _tdnn_block(p, h, k + ".tdnn2", pad="same")
        # SEBlock (no lengths at train parity): mean context
        s = h.mean(-1, keepdim=True)
        s = torch.relu(p.conv1d(s, k + ".se_block.conv1.conv"))
        s = torch.sigmoid(p.conv1d(s, k + ".se_block.conv2.conv"))
        xl.append(s * h + y)
    # multi-layer feature aggregation (skip the stem)
    x = torch.cat(xl[1:], dim=1)
    x = _tdnn_block(p, x, "mfa", pad="same")
    # AttentiveStatsPooling with global context (biased stats, eps 1e-12)
    def _stats(x, w):
        mean = (w * x).sum(-1)
        var = (w * (x - mean.unsqueeze(-1)) ** 2).sum(-1)
        return mean, torch.sqrt(var.clamp(min=1e-12))

    t = x.shape[-1]
    mean, std = _stats(x, torch.full((1, 1, t), 1.0 / t))
    attn_in = torch.cat([x, mean.unsqueeze(-1).expand_as(x),
                         std.unsqueeze(-1).expand_as(x)], dim=1)
    a = _tdnn_block(p, attn_in, "asp.tdnn", pad="same")
    a = torch.tanh(a)
    a = p.conv1d(a, "asp.conv.conv")
    a = torch.softmax(a, dim=2)
    mean, std = _stats(x, a)
    stats = torch.cat([mean, std], dim=1)
    stats = p.bn(stats.unsqueeze(-1), "asp_bn.norm").squeeze(-1)
    # final 1x1 conv to embedding
    return p.conv1d(stats.unsqueeze(-1), "fc.conv").squeeze(-1)


# ---------------------------------------------------------------------------
# TDNN (reference ``tdnn.py:9-68``; valid (un-padded) dilated convs)
# ---------------------------------------------------------------------------
def torch_tdnn(p, x):
    x = x.transpose(1, 2)
    for i, (k, d) in enumerate(((5, 1), (3, 2), (3, 3), (1, 1), (1, 1)),
                               start=1):
        x = torch.relu(p.conv1d(x, f"td_layer{i}", dil=d))
        if i < 5:
            x = p.bn(x, f"bn{i}")

    def _stats(x, w):
        mean = (w * x).sum(-1)
        var = (w * (x - mean.unsqueeze(-1)) ** 2).sum(-1)
        return mean, torch.sqrt(var.clamp(min=1e-12))

    t = x.shape[-1]
    mean, std = _stats(x, torch.full((1, 1, t), 1.0 / t))
    attn_in = torch.cat([x, mean.unsqueeze(-1).expand_as(x),
                         std.unsqueeze(-1).expand_as(x)], dim=1)
    a = _tdnn_block(p, attn_in, "pooling.tdnn", pad="same")
    a = p.conv1d(torch.tanh(a), "pooling.conv.conv")
    a = torch.softmax(a, dim=2)
    mean, std = _stats(x, a)
    out = p.bn(torch.cat([mean, std], 1).unsqueeze(-1),
               "bn5.norm").squeeze(-1)
    out = out.matmul(p("linear.weight")) + p("linear.bias")  # paddle (in,out)
    return p.bn(out.unsqueeze(-1), "bn6.norm").squeeze(-1)


# ---------------------------------------------------------------------------
# ERes2Net (reference ``eres2net.py:55-263``: Hardtanh(0,20) blocks,
# conv1x1 strides BOTH (F, T), bottom-up AFF fusion at 3 junctions)
# ---------------------------------------------------------------------------
def _aff(p, key, x, ds):
    a = p.conv2d(torch.cat([x, ds], dim=1), key + ".local_att.0", pad=0)
    a = p.bn(a, key + ".local_att.1")
    a = tF.silu(a)
    a = p.conv2d(a, key + ".local_att.3", pad=0)
    a = p.bn(a, key + ".local_att.4")
    att = 1.0 + torch.tanh(a)
    return x * att + ds * (2.0 - att)


def torch_eres2net(p, x, m=8, num_blocks=(1, 1, 1, 1), expansion=2,
                   base_width=32, scale=2, fuse_from_stage=2):
    ht = lambda v: tF.hardtanh(v, 0.0, 20.0)

    def block(x, key, planes, stride, use_aff, has_sc):
        width = int(math.floor(planes * (base_width / 64.0)))
        out = ht(p.bn(p.conv2d(x, key + ".conv1", stride=stride, pad=0),
                      key + ".bn1"))
        spx = torch.split(out, width, dim=1)
        cat = []
        for i in range(scale):
            if i == 0:
                sp = spx[0]
            elif use_aff:
                sp = _aff(p, key + f".fuse_models.{i - 1}", sp, spx[i])
            else:
                sp = sp + spx[i]
            sp = ht(p.bn(p.conv2d(sp, key + f".convs.{i}"),
                         key + f".bns.{i}"))
            cat.append(sp)
        out = p.bn(p.conv2d(torch.cat(cat, dim=1), key + ".conv3", pad=0),
                   key + ".bn3")
        res = x if not has_sc else p.bn(
            p.conv2d(x, key + ".shortcut.0", stride=stride, pad=0),
            key + ".shortcut.1")
        return ht(out + res)

    x = x.transpose(1, 2).unsqueeze(1)
    out = torch.relu(p.bn(p.conv2d(x, "conv1"), "bn1"))
    stage_outs = []
    in_planes = m
    for stage, (mul, stride) in enumerate(zip((1, 2, 4, 8), (1, 2, 2, 2))):
        planes = m * mul
        for b in range(num_blocks[stage]):
            s = stride if b == 0 else 1
            out = block(out, f"layer{stage + 1}.{b}", planes, s,
                        stage >= fuse_from_stage,
                        s != 1 or in_planes != planes * expansion)
            in_planes = planes * expansion
        stage_outs.append(out)
    o1, o2, o3, o4 = stage_outs
    f12 = _aff(p, "fuse_mode12", o2,
               p.conv2d(o1, "layer1_downsample", stride=2))
    f123 = _aff(p, "fuse_mode123", o3,
                p.conv2d(f12, "layer2_downsample", stride=2))
    f1234 = _aff(p, "fuse_mode1234", o4,
                 p.conv2d(f123, "layer3_downsample", stride=2))
    mean = f1234.mean(-1).flatten(1)                       # channel-major
    std = torch.sqrt(f1234.var(-1, unbiased=True) + 1e-8).flatten(1)
    stats = torch.cat([mean, std], dim=1)
    return stats.matmul(p("seg_1.weight")) + p("seg_1.bias")


def torch_eres2netv2(p, x, m=8, num_blocks=(1, 1, 1, 1), expansion=2,
                     base_width=26, scale=2):
    """Reference ``eres2net.py:383-462``: V2 fuses only layer3→layer4."""
    ht = lambda v: tF.hardtanh(v, 0.0, 20.0)

    def block(x, key, planes, stride, use_aff, has_sc):
        width = int(math.floor(planes * (base_width / 64.0)))
        out = ht(p.bn(p.conv2d(x, key + ".conv1", stride=stride, pad=0),
                      key + ".bn1"))
        spx = torch.split(out, width, dim=1)
        cat = []
        for i in range(scale):
            if i == 0:
                sp = spx[0]
            elif use_aff:
                sp = _aff(p, key + f".fuse_models.{i - 1}", sp, spx[i])
            else:
                sp = sp + spx[i]
            sp = ht(p.bn(p.conv2d(sp, key + f".convs.{i}"),
                         key + f".bns.{i}"))
            cat.append(sp)
        out = p.bn(p.conv2d(torch.cat(cat, dim=1), key + ".conv3", pad=0),
                   key + ".bn3")
        res = x if not has_sc else p.bn(
            p.conv2d(x, key + ".shortcut.0", stride=stride, pad=0),
            key + ".shortcut.1")
        return ht(out + res)

    x = x.transpose(1, 2).unsqueeze(1)
    out = torch.relu(p.bn(p.conv2d(x, "conv1"), "bn1"))
    stage_outs = []
    in_planes = m
    for stage, (mul, stride) in enumerate(zip((1, 2, 4, 8), (1, 2, 2, 2))):
        planes = m * mul
        for b in range(num_blocks[stage]):
            s = stride if b == 0 else 1
            out = block(out, f"layer{stage + 1}.{b}", planes, s, stage >= 2,
                        s != 1 or in_planes != planes * expansion)
            in_planes = planes * expansion
        stage_outs.append(out)
    o3, o4 = stage_outs[2], stage_outs[3]
    f34 = _aff(p, "fuse34", o4, p.conv2d(o3, "layer3_ds", stride=2))
    mean = f34.mean(-1).flatten(1)
    std = torch.sqrt(f34.var(-1, unbiased=True) + 1e-8).flatten(1)
    stats = torch.cat([mean, std], dim=1)
    return stats.matmul(p("seg_1.weight")) + p("seg_1.bias")


# ---------------------------------------------------------------------------
# Res2Net (reference ``res2net.py:11-167``: 7x7 s3 stem, maxpool,
# Bottle2neck with 'stage' exclusive avg-pool on the residual chunk)
# ---------------------------------------------------------------------------
def _asp_head(p, x, prefix, bn2, linear, bn3):
    """pooling (ASP) -> BN -> Linear -> BN head shared by TDNN-shaped
    models (reference ``tdnn.py:23-28`` / ``res2net.py:109-113``)."""
    def _stats(x, w):
        mean = (w * x).sum(-1)
        var = (w * (x - mean.unsqueeze(-1)) ** 2).sum(-1)
        return mean, torch.sqrt(var.clamp(min=1e-12))

    t = x.shape[-1]
    mean, std = _stats(x, torch.full((1, 1, t), 1.0 / t))
    attn_in = torch.cat([x, mean.unsqueeze(-1).expand_as(x),
                         std.unsqueeze(-1).expand_as(x)], dim=1)
    a = _tdnn_block(p, attn_in, prefix + ".tdnn", pad="same")
    a = p.conv1d(torch.tanh(a), prefix + ".conv.conv")
    a = torch.softmax(a, dim=2)
    mean, std = _stats(x, a)
    out = p.bn(torch.cat([mean, std], 1).unsqueeze(-1), bn2).squeeze(-1)
    out = out.matmul(p(linear + ".weight")) + p(linear + ".bias")
    return p.bn(out.unsqueeze(-1), bn3).squeeze(-1)


def torch_res2net(p, x, m=8, layers=(1, 1, 1, 1), base_width=32, scale=2):
    expansion, nums = 4, (1 if scale == 1 else scale - 1)

    def block(x, key, planes, stride, stype, has_ds):
        width = int(math.floor(planes * (base_width / 64.0)))
        out = torch.relu(p.bn(p.conv2d(x, key + ".conv1", pad=0),
                              key + ".bn1"))
        spx = torch.chunk(out, scale, dim=1)
        cat = []
        for i in range(nums):
            sp = spx[i] if (i == 0 or stype == "stage") else sp + spx[i]
            sp = torch.relu(p.bn(
                p.conv2d(sp, key + f".convs.{i}", stride=stride),
                key + f".bns.{i}"))
            cat.append(sp)
        if scale != 1:
            last = spx[nums]
            if stype == "stage":
                last = tF.avg_pool2d(last, 3, stride=stride, padding=1,
                                     count_include_pad=False)
            cat.append(last)
        out = p.bn(p.conv2d(torch.cat(cat, dim=1), key + ".conv3", pad=0),
                   key + ".bn3")
        res = x if not has_ds else p.bn(
            p.conv2d(x, key + ".downsample.0", stride=stride, pad=0),
            key + ".downsample.1")
        return torch.relu(out + res)

    x = x.transpose(1, 2).unsqueeze(1)
    out = torch.relu(p.bn(tF.conv2d(x, p("conv1.weight"), p("conv1.bias"),
                                    stride=3, padding=1), "bn1"))
    out = tF.max_pool2d(out, 3, stride=2, padding=1)
    in_planes = m
    for stage, (mul, stride) in enumerate(zip((1, 2, 4, 8), (1, 2, 2, 2))):
        planes = m * mul
        for b in range(layers[stage]):
            s = stride if b == 0 else 1
            stype = "stage" if b == 0 else "normal"
            has_ds = b == 0 and (s != 1 or in_planes != planes * expansion)
            out = block(out, f"layer{stage + 1}.{b}", planes, s, stype,
                        has_ds)
            in_planes = planes * expansion
    b_, c, f, t = out.shape
    x = out.reshape(b_, c * f, t)                          # channel-major
    return _asp_head(p, x, "pooling", "bn2.norm", "linear", "bn3.norm")


# ---------------------------------------------------------------------------
# ResNetSE (reference ``resnet_se.py:8-139``)
# ---------------------------------------------------------------------------
def torch_resnet_se(p, x, num_filters=(8, 8, 16, 16), layers=(1, 1, 1, 1)):
    expansion = 2

    def block(x, key, planes, stride, has_ds):
        out = torch.relu(p.bn(p.conv2d(x, key + ".conv1", pad=0),
                              key + ".bn1"))
        out = torch.relu(p.bn(p.conv2d(out, key + ".conv2", stride=stride),
                              key + ".bn2"))
        out = p.bn(p.conv2d(out, key + ".conv3", pad=0), key + ".bn3")
        # SELayer: global (F,T) mean -> fc -> sigmoid scale
        y = out.mean(dim=(2, 3))
        y = torch.relu(y.matmul(p(key + ".se.fc.0.weight"))
                       + p(key + ".se.fc.0.bias"))
        y = torch.sigmoid(y.matmul(p(key + ".se.fc.2.weight"))
                          + p(key + ".se.fc.2.bias"))
        out = out * y[:, :, None, None]
        res = x if not has_ds else p.bn(
            p.conv2d(x, key + ".downsample.0", stride=stride, pad=0),
            key + ".downsample.1")
        return torch.relu(out + res)

    x = x.transpose(1, 2).unsqueeze(1)
    out = torch.relu(p.bn(p.conv2d(x, "conv1"), "bn1"))
    in_planes = num_filters[0]
    for stage, stride in enumerate((1, 2, 2, 2)):
        planes = num_filters[stage]
        for b in range(layers[stage]):
            s = stride if b == 0 else 1
            has_ds = b == 0 and (s != 1 or in_planes != planes * expansion)
            out = block(out, f"layer{stage + 1}.{b}", planes, s, has_ds)
            in_planes = planes * expansion
    b_, c, f, t = out.shape
    x = out.reshape(b_, c * f, t)
    return _asp_head(p, x, "pooling", "bn2.norm", "linear", "bn3.norm")


# ---------------------------------------------------------------------------
# the cross-checks
# ---------------------------------------------------------------------------
def _crosscheck(name, args, input_size, t_len, torch_fwd, seed=7):
    model = MODELS[name](input_size=input_size, **args)
    param_shapes, stat_shapes = _model_tree_shapes(name, args, input_size)
    entries = SPECS[name](input_size, **args)
    rng = np.random.RandomState(seed)
    state = _synth_paddle_state(entries, param_shapes, stat_shapes, rng)
    tree = convert_state(state, name, input_size, model_args=args)

    x = rng.randn(2, t_len, input_size).astype(np.float32)
    got = np.asarray(MODELS[name](input_size=input_size, **args).apply(
        {"params": tree["params"]["backbone"],
         "batch_stats": tree["batch_stats"]["backbone"]},
        jnp.asarray(x), train=False), np.float32)
    with torch.no_grad():
        ref = torch_fwd(P(state), torch.from_numpy(x)).numpy()

    assert got.shape == ref.shape
    scale = np.abs(ref).max() + 1e-9
    cos = float(np.min((ref * got).sum(-1)
                       / (np.linalg.norm(ref, axis=-1)
                          * np.linalg.norm(got, axis=-1))))
    assert cos > 0.9999, (cos, np.abs(ref - got).max() / scale)
    assert np.abs(ref - got).max() / scale < 5e-3


def test_campplus_matches_torch_rederivation():
    _crosscheck("CAMPPlus", dict(embd_dim=32), input_size=40, t_len=250,
                torch_fwd=torch_campplus)


def test_ecapa_matches_torch_rederivation():
    args = dict(channels=(32, 32, 32, 32, 96), res2net_scale=4,
                se_channels=16, attention_channels=16, embd_dim=16)
    _crosscheck("EcapaTdnn", args, input_size=40, t_len=120,
                torch_fwd=lambda p, x: torch_ecapa(p, x, scale=4))


def test_tdnn_matches_torch_rederivation():
    _crosscheck("TDNN", dict(channels=32, embd_dim=16), input_size=40,
                t_len=120, torch_fwd=torch_tdnn)


def test_eres2net_matches_torch_rederivation():
    args = dict(m_channels=8, num_blocks=(1, 1, 1, 1), embd_dim=16)
    _crosscheck("ERes2Net", args, input_size=40, t_len=96,
                torch_fwd=lambda p, x: torch_eres2net(p, x, m=8))


def test_eres2netv2_matches_torch_rederivation():
    args = dict(m_channels=8, num_blocks=(1, 1, 1, 1), embd_dim=16)
    _crosscheck("ERes2NetV2", args, input_size=40, t_len=96,
                torch_fwd=lambda p, x: torch_eres2netv2(p, x, m=8))


def test_res2net_matches_torch_rederivation():
    args = dict(m_channels=8, layers=(1, 1, 1, 1), embd_dim=16)
    _crosscheck("Res2Net", args, input_size=80, t_len=96,
                torch_fwd=lambda p, x: torch_res2net(p, x, m=8))


def test_resnet_se_matches_torch_rederivation():
    args = dict(num_filters=(8, 8, 16, 16), layers=(1, 1, 1, 1), embd_dim=16)
    _crosscheck("ResNetSE", args, input_size=40, t_len=96,
                torch_fwd=torch_resnet_se)
