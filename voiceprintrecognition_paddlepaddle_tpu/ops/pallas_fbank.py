"""Pallas TPU kernel: fused Kaldi-fbank (DC-removal → pre-emphasis →
povey window → real-DFT → power → mel → log) straight from the waveform.

This is the hot op of the front-end (SURVEY.md §2 names the fused STFT+mel
kernel as the north star; reference semantics =
``paddleaudio.compliance.kaldi.fbank`` via
``/root/reference/ppvector/data_utils/featurizer.py:83-101``).

The TPU-first trick: overlapping 400-sample frames are never materialised.
Because DC removal, pre-emphasis (with Kaldi's edge-replicated first
sample) and the window are all *linear* in the frame samples, they fold
into the DFT matrix:

    spec[t] = sum_k  B[k] * wave[160*t + k]        B: (400, 2*n_bins)

so with the waveform reshaped (free) to rows of one frame-shift,
``X: (T+2, 160)``, the spectrum is three shifted matmuls

    spec = X @ B[0:160]  +  up1(X @ B[160:320])  +  up2(X @ B[320:400])

— HBM traffic collapses to (wave in) + (log-mel out), with zero gather or
concat traffic (the slice/concat framing alone used to cost 2 ms at
batch 256×3 s; the whole kernel now runs in ~1 ms).

Numerics: the DFT has cancellation, so plain bf16 products would corrupt
low-energy bins. The kernel uses hand-rolled 3-pass bf16 products
(hi/lo splitting both operands, dropping only the lo*lo term — the same
contraction Precision.HIGH performs, which Mosaic does not lower), packed
into a single K-concatenated matmul ``[x_hi | x_hi | x_lo] @
[[B_hi], [B_lo], [B_hi]]`` per piece so the MXU sees one large contraction
instead of three small ones.

The Nyquist bin is dropped: its mel weight is exactly zero whenever
high_freq = Nyquist (asserted), which makes the DFT width 2*(n_fft/2) —
exactly 512 lanes for the standard 16 kHz config, a perfect MXU tile.

Numerics match ``ops.kaldi.fbank`` (interpret-mode tests on CPU, tolerance
tests on device); use ``fbank_pallas`` as a drop-in for the jnp path.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import kaldi

__all__ = ["fbank_pallas"]


def _folded_dft_np(frame_len, n_fft, preemph=0.97):
    """DFT matrix with DC-removal, pre-emphasis and povey window folded in.

    Returns ``B: (frame_len, 2*(n_fft//2))`` (Nyquist dropped) such that
    ``frame @ B`` equals window(preemph(dc_remove(frame))) @ rdft.
    """
    n_bins = n_fft // 2 + 1
    keep = n_bins - 1
    rdft = kaldi._rdft_np(frame_len, n_fft)                # (flen, 2*n_bins)
    rdft = np.concatenate(
        [rdft[:, :keep], rdft[:, n_bins:n_bins + keep]], axis=1)
    window = kaldi._window_np("povey", frame_len).astype(np.float64)
    wp = window[:, None] * rdft.astype(np.float64)         # W'[j]
    c = np.zeros_like(wp)
    # y[j] = (x[j]-mu) - p*(x[j-1]-mu) for j>=1;  y[0] = (1-p)*(x[0]-mu)
    c[1:] += wp[1:]
    c[:-1] -= preemph * wp[1:]
    c[0] += (1.0 - preemph) * wp[0]
    # the -mu terms: coefficient of mu is -( (1-p)*sum_{j>=1} W' + (1-p)*W'[0] )
    s = ((1.0 - preemph) * wp[1:].sum(axis=0)
         + (1.0 - preemph) * wp[0])
    c -= s[None, :] / frame_len
    return c.astype(np.float64)


def _kernel(*refs, n_bins, log_eps, shifts, n_chunks):
    """One (batch-step, bin-chunk) grid cell: the DFT accumulation is
    split across the SECOND grid dimension — each cell computes a
    contiguous chunk of [cos | sin] spectrum lanes and accumulates its
    partial mel projection into the revisited out block. Splitting the
    lanes keeps per-cell temporaries small, which lifts the scoped-VMEM
    ceiling that capped row blocks at u=4 (ROADMAP round-2: 2.6 ms where
    the matmuls cost ~1 ms).

    CMN is NOT fused here: a round-5 device A/B (ROADMAP "Measured
    decisions") showed folding apply_cmn_and_mask into this final pass
    runs 1.66 vs 1.53 ms/iter at b256 x 3 s — the onehot mean matmuls
    (K~4.8k, N=u=16, 12% lane occupancy) cost more than the ~0.06 ms
    feature-map HBM round-trip they save, and the bf16 MXU truncation
    widened parity from 2e-3 to 2e-2. The fold was deleted (it lived at
    commit 3f59e1b)."""
    x_ref, w0_ref, w1_ref, w2_ref, mel_ref, out_ref = refs
    c = pl.program_id(1)
    x = x_ref[:]                                           # (R, shift) f32
    x_hi = x.astype(jnp.bfloat16)
    x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    xx = jnp.concatenate([x_hi, x_hi, x_lo], axis=1)       # (R, 3*shift)

    def up(p, s):
        if s == 0:
            return p
        return jnp.concatenate(
            [p[s:], jnp.zeros((s, p.shape[1]), p.dtype)], axis=0)

    spec = up(jnp.dot(xx, w0_ref[0], preferred_element_type=jnp.float32), 0)
    for s, w_ref in zip(shifts, (w1_ref, w2_ref)):
        spec = spec + up(
            jnp.dot(xx, w_ref[0], preferred_element_type=jnp.float32), s)
    power = spec[:, :n_bins] ** 2 + spec[:, n_bins:] ** 2
    mels = jnp.dot(power, mel_ref[0], preferred_element_type=jnp.float32)

    @pl.when(c == 0)
    def _():
        out_ref[:] = mels

    @pl.when(c > 0)
    def _():
        out_ref[:] = out_ref[:] + mels

    @pl.when(c == n_chunks - 1)
    def _():
        out_ref[:] = jnp.log(jnp.maximum(out_ref[:], log_eps))


@functools.partial(jax.jit, static_argnames=("sr", "n_mels", "frame_length",
                                             "frame_shift", "interpret"))
def fbank_pallas(waveforms, sr: int = 16000, n_mels: int = 80,
                 frame_length: float = 25.0, frame_shift: float = 10.0,
                 interpret: bool = False):
    """Batched kaldi fbank ``(B, L) -> (B, T, n_mels)``, fused on TPU.

    Defaults (povey window, preemph 0.97, DC removal, power spectrum,
    low 20 Hz / high Nyquist, dither 0) mirror ``kaldi.fbank``. CMN/tail
    masking stays outside (``features.apply_cmn_and_mask``): the in-kernel
    fold was device-measured slower and deleted (see ``_kernel``).
    """
    waveforms = jnp.asarray(waveforms, jnp.float32)
    b, num_samples = waveforms.shape
    frame_len = int(sr * frame_length / 1000.0)
    shift = int(sr * frame_shift / 1000.0)
    n_fft = kaldi.next_power_of_two(frame_len)
    t = kaldi.num_frames_snip_edges(num_samples, frame_len, shift)

    n_pieces = -(-frame_len // shift)                      # ceil
    rows_u = t + n_pieces - 1
    assert n_pieces == 3, "kernel currently assumes frame_len <= 3*shift"

    # wave -> (B, rows_u, shift): a free reshape (plus tail pad/trim)
    need = rows_u * shift
    w = waveforms[..., :min(num_samples, need)]
    if need > w.shape[-1]:
        w = jnp.pad(w, ((0, 0), (0, need - w.shape[-1])))
    x = w.reshape(b, rows_u, shift)

    # utterances per grid step: the 2-D grid (batch step x bin chunk)
    # keeps per-cell temporaries ~4x smaller, so row blocks can grow to
    # ~4-5k and amortise per-op overhead; candidates must divide the
    # batch, so no batch padding is needed
    u = 1
    for cand in (16, 8, 4, 2):
        if b % cand == 0 and cand * rows_u <= 5120 and (cand * rows_u) % 8 == 0:
            u = cand
            break
    b_pad = b
    rows = u * rows_u
    if rows % 8:
        # fall back: single-utterance blocks padded to a sublane multiple
        u, pad_r = 1, (-rows_u) % 8
        x = jnp.pad(x, ((0, 0), (0, pad_r), (0, 0)))
        rows = rows_u + pad_r
    x = x.reshape(-1, shift)

    # folded DFT pieces, hi/lo split for 3-pass bf16 products
    bmat = _folded_dft_np(frame_len, n_fft)                # (flen, 2*keep)
    keep = n_fft // 2
    mel_np = kaldi._kaldi_mel_banks_np(n_mels, n_fft, sr)
    assert np.all(mel_np[keep] == 0.0)  # Nyquist weight; holds for high=Nyq

    # bin chunks: each grid cell handles `cb` bins = 2*cb spectrum lanes
    n_chunks = 4 if keep % 4 == 0 else 1
    cb = keep // n_chunks

    def packed(piece):
        """(shift, 2*keep) fp64 -> (n_chunks, 3*shift, 2*cb) bf16 with
        [hi; lo; hi] row packing and per-chunk [cos | sin] columns."""
        p = np.zeros((shift, 2 * keep), np.float64)
        p[:piece.shape[0]] = piece
        hi = p.astype(np.float32).astype(jnp.bfloat16)
        lo = (p - np.asarray(hi, np.float64)).astype(np.float32) \
            .astype(jnp.bfloat16)
        # rows [0:S] multiply x_hi -> hi ; [S:2S] x_hi -> lo ; [2S:] x_lo -> hi
        full = np.concatenate([hi, lo, hi], axis=0)        # (3S, 2*keep)
        chunks = [np.concatenate(
            [full[:, c * cb:(c + 1) * cb],
             full[:, keep + c * cb:keep + (c + 1) * cb]], axis=1)
            for c in range(n_chunks)]
        return jnp.asarray(np.stack(chunks))

    w0 = packed(bmat[0:shift])
    w1 = packed(bmat[shift:2 * shift])
    w2 = packed(bmat[2 * shift:frame_len])
    mel = jnp.asarray(np.stack(
        [mel_np[c * cb:(c + 1) * cb] for c in range(n_chunks)]))

    kernel = functools.partial(
        _kernel, n_bins=cb, log_eps=float(np.finfo(np.float32).eps),
        shifts=(1, 2), n_chunks=n_chunks)
    grid = (x.shape[0] // rows, n_chunks)
    common = dict(
        out_shape=jax.ShapeDtypeStruct((x.shape[0], n_mels), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )
    wspec = lambda a: pl.BlockSpec((1,) + a.shape[1:],
                                   lambda i, c: (c, 0, 0),
                                   memory_space=pltpu.VMEM)
    in_arrays = [x, w0, w1, w2, mel]
    in_specs = [
        pl.BlockSpec((rows, shift), lambda i, c: (i, 0),
                     memory_space=pltpu.VMEM),
        wspec(w0), wspec(w1), wspec(w2), wspec(mel),
    ]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows, n_mels), lambda i, c: (i, 0),
                               memory_space=pltpu.VMEM),
        **common,
    )(*in_arrays)
    return out.reshape(b_pad, -1, n_mels)[:b, :t]
