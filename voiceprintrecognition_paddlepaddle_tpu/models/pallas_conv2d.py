"""Pallas TPU conv ops for the CAM++ FCM *training* path.

Training can't use the fused inference FCM kernel (``pallas_fcm.py``):
BatchNorm sits between the convolutions and needs batch statistics (and
their gradients), which XLA handles well. What XLA does NOT handle well
is the convs themselves — 3x3 at 32 channels run at ~25% useful MXU
occupancy (Cout padded 32 -> 128; the round-2 padded-cost model matched
the measured 7.9 ms FCM forward within 7%). This module provides a
drop-in conv op with the same space-to-depth im2col reformulation as the
inference kernel (56% useful density stride-1 / 45% stride-2) and a full
``jax.custom_vjp``:

- forward: im2col patches + one ``(rows, K) @ (K, 128)`` matmul
- input gradient: the SAME forward kernel with the kernel flipped and
  in/out channels swapped (stride 1), or a mirrored even/odd-output
  patch build (stride 2 — the transposed conv's scatter becomes two
  gathers over the output parities)
- weight gradient: ``P^T @ dy`` — one big matmul contracting over all
  positions, accumulated across the batch grid; the packed (K, 128)
  gradient is unpacked host-side by summing each tap's parity copies

Reference semantics: ``nn.Conv(features, (3,3), strides=(s,1),
padding=((1,1),(1,1)))`` on NHWC ``(B, F, T, C)`` — the convs of
``ppvector/models/campplus.py:211-281`` (BasicResBlock / FCM).

Numerics: fp32 interpret-mode tests match ``lax.conv_general_dilated``
and its ``jax.grad`` to float rounding; see ``tests/test_pallas_conv2d.py``.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_fcm import (_PLAN1_NC, _PLAN2_NC, _pack_conv3x3, _round_up,
                         _split, _taps)

__all__ = ["conv2d_sd", "sd_supported"]

_C = 32


# ---------------------------------------------------------------------------
# layout: (B, F, T, C) <-> space-to-depth (B, F/2, t2p, 128)
# ---------------------------------------------------------------------------
def _s2d(x, t2p):
    """(B, F, T, C) -> (B, F/2, t2p, 4*C), lane = (pf*2 + pt)*C + c,
    zero padded past T."""
    b, f, t, c = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 2 * t2p - t), (0, 0)))
    x = x.reshape(b, f // 2, 2, t2p, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, f // 2, t2p, 4 * c)


def _degroup(y, t):
    """(B, Fg, t2p, 128) -> (B, 2*Fg, T, 32)."""
    b, fg, t2p, _ = y.shape
    y = y.reshape(b, fg, t2p, 2, 2, _C).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, 2 * fg, 2 * t2p, _C)[:, :, :t]


# ---------------------------------------------------------------------------
# kernel helpers (shared by fwd / dgrad / wgrad kernels)
# ---------------------------------------------------------------------------
def _mk_copy(cd):
    def copy(pref, d0, width, s, src, l0, m):
        """pref[r, d0:d0+width] = src[r+s, l0:l0+width], zero filled past
        the array (the 'same' zero padding)."""
        if s >= 0:
            pref[0:m - s, d0:d0 + width] = src[s:m, l0:l0 + width]
            if s:
                pref[m - s:m, d0:d0 + width] = jnp.zeros((s, width), cd)
        else:
            pref[-s:m, d0:d0 + width] = src[0:m + s, l0:l0 + width]
            pref[0:-s, d0:d0 + width] = jnp.zeros((-s, width), cd)
    return copy


def _build_s1(copy, p_s, x, fg, t2p):
    """Shifted (non-center) taps into p_s[:, :384]; the zero-shift center
    group rides a direct matmul against W rows [384:512] (``_taps`` packs
    it last). Returns (rows, center operand list)."""
    m = fg * t2p
    for d0, n, _, fo, to, b0 in _PLAN1_NC:
        copy(p_s, d0 * 32, n * 32, fo * t2p + to, x, b0 * 32, m)
    return m, [x]


def _build_s2(copy, p_s, x3, fg_in, t2p):
    """Stride-2 variant: center groups are the even AND odd zero-shift
    reads (W rows [384:512] and [512:640])."""
    x3 = x3.reshape(fg_in // 2, 2, t2p, 128)
    e = x3[:, 0].reshape(-1, 128)
    o = x3[:, 1].reshape(-1, 128)
    m = (fg_in // 2) * t2p
    for d0, n, src, fo, to, b0 in _PLAN2_NC:
        copy(p_s, d0 * 32, n * 32, fo * t2p + to, (e, o)[src], b0 * 32, m)
    return m, [e, o]


# ---------------------------------------------------------------------------
# forward (also serves stride-1 dgrad with a flipped packed weight)
# ---------------------------------------------------------------------------
def _fwd_kernel(x_ref, w_ref, b_ref, out_ref, p_s, *, t2p, fg_in, stride,
                cd):
    copy = _mk_copy(cd)
    x = x_ref[0].reshape(fg_in * t2p, 128)
    build = _build_s1 if stride == 1 else _build_s2
    m, centers = build(copy, p_s, x, fg_in, t2p)
    y = jnp.dot(p_s[0:m, 0:384], w_ref[0:384, :],
                preferred_element_type=jnp.float32)
    for i, c in enumerate(centers):
        y = y + jnp.dot(c, w_ref[384 + i * 128:512 + i * 128, :],
                        preferred_element_type=jnp.float32)
    out_ref[...] = (y + b_ref[:]).astype(cd).reshape(out_ref.shape)


@functools.partial(jax.jit, static_argnames=("stride", "t", "interpret"))
def _fwd_call(xs, wp, bias_lane, *, stride, t, interpret):
    b, fg_in, t2p, _ = xs.shape
    cd = xs.dtype
    fg_out = fg_in // stride
    kernel = functools.partial(_fwd_kernel, t2p=t2p, fg_in=fg_in,
                               stride=stride, cd=cd)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, fg_in, t2p, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wp.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, fg_out, t2p, 128),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, fg_out, t2p, 128), cd),
        interpret=interpret,
        scratch_shapes=[pltpu.VMEM((fg_out * t2p, 384), cd)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(xs, wp, bias_lane)
    return out


# ---------------------------------------------------------------------------
# stride-2 input gradient: two mirrored gathers over the output parities
# ---------------------------------------------------------------------------
def _dgrad2_taps(even):
    """Tap list for the dx build at even/odd input freq groups g_i.

    dx[f_in] sums dy[f_out] W[df] over df with f_out = (f_in + 1 - df)/2
    integral. In s2d terms (f_in = 2*g_i + pf_i, dy group h, parity p_o):
    g_i = 2h   (even): f_out=2h   -> (h, p0) via df = 1 + pf_i
                       f_out=2h+1 -> (h, p1) via df = 0 (pf_i=1 only)
    g_i = 2h+1 (odd):  f_out=2h+1 -> (h, p1) via df = 1 + pf_i
                       f_out=2h+2 -> (h+1, p0) via df = 0 (pf_i=1 only)
    Time is stride-1: dt = pt_i + 1 - (2*t_off + pt_o).
    Returns [(g_off, p_o, q_t)] ordered (g_off, t_off, p_o, pt_o)."""
    if even:
        freq = [(0, 0), (0, 1)]
    else:
        freq = [(0, 1), (1, 0)]
    out = [(g, p, qt) for (g, p) in freq for qt in (-1, 0, 1, 2)]
    return sorted(out, key=lambda e: (e[0], _split(e[2])[1], e[1],
                                      _split(e[2])[0]))


def _dgrad2_plan(even):
    """Merged copy descriptors (dest_block0, n_blocks, g_off, t_off,
    src_block0) — taps sharing a shift sit in consecutive slots with
    ascending source lane blocks (the _dgrad2_taps sort), so adjacent
    copies coalesce into wide moves (8 taps -> 5/6 copies per half)."""
    plan = []
    for slot, (g, p, qt) in enumerate(_dgrad2_taps(even)):
        pt, to = _split(qt)
        blk = p * 2 + pt
        if (plan and tuple(plan[-1][2:4]) == (g, to)
                and plan[-1][0] + plan[-1][1] == slot
                and plan[-1][4] + plan[-1][1] == blk):
            plan[-1][1] += 1
        else:
            plan.append([slot, 1, g, to, blk])
    return [tuple(e) for e in plan]


def _pack_dgrad2(kernel, even, compute_dtype):
    """(3,3,ci,co) -> (K=256, 128) for the even/odd dx build: rows = tap
    (g_off, p_o, q_t) x co; cols = (pf_i, pt_i, ci)."""
    z = jnp.zeros((_C, _C), kernel.dtype)
    rows = []
    for g_off, p_o, qt in _dgrad2_taps(even):
        pt_o, t_off = _split(qt)
        cols = []
        for pfi in (0, 1):
            for pti in (0, 1):
                # freq: df solving f_out relation for this (g_off, p_o)
                if even:
                    df = (1 + pfi) if (g_off, p_o) == (0, 0) else \
                        (0 if (pfi == 1 and (g_off, p_o) == (0, 1)) else -1)
                else:
                    df = (1 + pfi) if (g_off, p_o) == (0, 1) else \
                        (0 if (pfi == 1 and (g_off, p_o) == (1, 0)) else -1)
                dt = pti + 1 - (2 * t_off + pt_o)
                if 0 <= df <= 2 and 0 <= dt <= 2:
                    # dy @ W^T: rows co, cols ci
                    cols.append(kernel[df, dt].T)
                else:
                    cols.append(z)
        rows.append(jnp.concatenate(cols, axis=1))
    return jnp.concatenate(rows, axis=0).astype(compute_dtype)


def _dgrad2_kernel(dy_ref, we_ref, wo_ref, out_ref, p_s, *, t2p, fg_out,
                   cd):
    copy = _mk_copy(cd)
    dy = dy_ref[0].reshape(fg_out * t2p, 128)
    m = fg_out * t2p
    halves = []
    for even, w_ref in ((True, we_ref), (False, wo_ref)):
        for d0, n, g_off, t_off, b0 in _dgrad2_plan(even):
            copy(p_s, d0 * 32, n * 32, g_off * t2p + t_off, dy,
                 b0 * 32, m)
        halves.append(jnp.dot(p_s[0:m, 0:256], w_ref[:],
                              preferred_element_type=jnp.float32))
    dx = jnp.stack([h.reshape(fg_out, t2p, 128) for h in halves], axis=1)
    out_ref[...] = dx.reshape(out_ref.shape).astype(cd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _dgrad2_call(dys, we, wo, *, interpret):
    b, fg_out, t2p, _ = dys.shape
    cd = dys.dtype
    kernel = functools.partial(_dgrad2_kernel, t2p=t2p, fg_out=fg_out,
                               cd=cd)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, fg_out, t2p, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(we.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wo.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * fg_out, t2p, 128),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2 * fg_out, t2p, 128), cd),
        interpret=interpret,
        scratch_shapes=[pltpu.VMEM((fg_out * t2p, 256), cd)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(dys, we, wo)
    return out


# ---------------------------------------------------------------------------
# weight gradient: P^T @ dy accumulated across the batch grid
# ---------------------------------------------------------------------------
def _wgrad_kernel(x_ref, dy_ref, out_ref, p_s, *, t2p, fg_in, stride, cd):
    copy = _mk_copy(cd)
    x = x_ref[0].reshape(fg_in * t2p, 128)
    build = _build_s1 if stride == 1 else _build_s2
    m, centers = build(copy, p_s, x, fg_in, t2p)
    dy = dy_ref[0].reshape(m, 128)
    # contraction over positions: (K, m) @ (m, 128); the center rows come
    # straight from the activation arrays (no patch copy)
    parts = [jax.lax.dot_general(p_s[0:m, 0:384], dy,
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)]
    for c in centers:
        parts.append(jax.lax.dot_general(c, dy, (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32))
    dwp = jnp.concatenate(parts, axis=0)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = dwp

    @pl.when(pl.program_id(0) > 0)
    def _():
        out_ref[:] = out_ref[:] + dwp


@functools.partial(jax.jit, static_argnames=("stride", "interpret"))
def _wgrad_call(xs, dys, *, stride, interpret):
    b, fg_in, t2p, _ = xs.shape
    cd = xs.dtype
    fg_out = fg_in // stride
    k = 512 if stride == 1 else 640
    kernel = functools.partial(_wgrad_kernel, t2p=t2p, fg_in=fg_in,
                               stride=stride, cd=cd)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, fg_in, t2p, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fg_out, t2p, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, 128), jnp.float32),
        interpret=interpret,
        scratch_shapes=[pltpu.VMEM((fg_out * t2p, 384), cd)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(xs, dys)
    return out


def _unpack_wgrad(dwp, stride):
    """Packed (K, 128) weight gradient -> (3, 3, 32, 32): each kernel tap
    was COPIED into every in-range (tap slot, output parity) block of the
    packed forward weight, so its gradient is the sum of those copies."""
    dw = jnp.zeros((3, 3, _C, _C), dwp.dtype)
    for slot, (qf, qt) in enumerate(_taps(stride)):
        for pfo in (0, 1):
            for pto in (0, 1):
                df = qf - stride * pfo + 1
                dt = qt - pto + 1
                if 0 <= df <= 2 and 0 <= dt <= 2:
                    blk = dwp[slot * 32:(slot + 1) * 32,
                              (pfo * 2 + pto) * 32:(pfo * 2 + pto + 1) * 32]
                    dw = dw.at[df, dt].add(blk)
    return dw


# ---------------------------------------------------------------------------
# the op
# ---------------------------------------------------------------------------
def _geometry(f, t):
    t2 = -(-t // 2)
    return _round_up(t2 + 1, 8)


def sd_supported(x_shape, stride):
    """The op serves concrete NHWC shapes with C=32, even F, and a
    per-utterance VMEM footprint under the budget."""
    b, f, t, c = x_shape
    if not all(isinstance(d, int) for d in (b, f, t, c)):
        return False
    return (c == _C and f % 2 == 0 and (stride == 1 or f % 4 == 0)
            and f >= 2 * stride and t <= 2048 and f <= 160)


def _fwd(x, kernel, bias, stride, interpret):
    b, f, t, c = x.shape
    t2p = _geometry(f, t)
    cd = x.dtype
    xs = _s2d(x, t2p)
    wp = _pack_conv3x3(kernel, stride, cd)
    bias_lane = jnp.tile(bias.astype(jnp.float32), 4)[None, :]
    out = _fwd_call(xs, wp, bias_lane, stride=stride, t=t,
                    interpret=interpret)
    return _degroup(out, t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv2d_sd(x, kernel, bias, stride, interpret=False):
    """``nn.Conv(32, (3,3), strides=(stride,1), padding='same')`` on NHWC
    ``(B, F, T, 32)`` via the space-to-depth Pallas matmul, with a full
    custom VJP (Pallas dgrad + wgrad)."""
    return _fwd(x, kernel, bias, stride, interpret)


def _vjp_fwd(x, kernel, bias, stride, interpret):
    return _fwd(x, kernel, bias, stride, interpret), (x, kernel)


def _vjp_bwd(stride, interpret, res, dy):
    x, kernel = res
    b, f, t, c = x.shape
    t2p = _geometry(f, t)
    cd = x.dtype
    dys = _s2d(dy.astype(cd), t2p)

    # input gradient
    if stride == 1:
        wd = _pack_conv3x3(
            kernel[::-1, ::-1].transpose(0, 1, 3, 2), 1, cd)
        dxs = _fwd_call(dys, wd, jnp.zeros((1, 128), jnp.float32),
                        stride=1, t=t, interpret=interpret)
    else:
        we = _pack_dgrad2(kernel, True, cd)
        wo = _pack_dgrad2(kernel, False, cd)
        dxs = _dgrad2_call(dys, we, wo, interpret=interpret)
    dx = _degroup(dxs, t).astype(x.dtype)

    # weight / bias gradients
    xs = _s2d(x, t2p)
    dwp = _wgrad_call(xs, dys, stride=stride, interpret=interpret)
    dw = _unpack_wgrad(dwp, stride).astype(kernel.dtype)
    db = dy.astype(jnp.float32).sum(axis=(0, 1, 2)).astype(kernel.dtype)
    return dx, dw, db


conv2d_sd.defvjp(_vjp_fwd, _vjp_bwd)
