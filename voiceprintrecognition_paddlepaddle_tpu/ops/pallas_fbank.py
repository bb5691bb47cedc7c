"""Pallas TPU kernel: fused Kaldi-fbank tail (DC-removal → pre-emphasis →
povey window → real-DFT matmul → power → mel matmul → log).

This is the hot op of the front-end (SURVEY.md §2 names the fused STFT+mel
kernel as the north star). The framing gather stays in XLA (a pure
bandwidth op XLA handles well); everything after it happens in one VMEM
round-trip per row tile — the (rows, 2*n_bins) spectrum never touches HBM,
and both matmuls run on the MXU:

    frames (R,400) ─ VPU: dc/preemph/window ─ MXU: @rdft (400→514)
                  └ VPU: re²+im² ───────────── MXU: @mel (257→80) ─ log

Numerics match ``ops.kaldi.fbank`` (tested in interpret mode on CPU and on
device); use ``fbank_pallas`` as a drop-in for the jnp path.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import kaldi

__all__ = ["fbank_pallas"]

_ROW_TILE = 512  # rows per grid step; 512 benchmarked fastest on v5e


def _kernel(frames_ref, window_ref, rdft_ref, mel_ref, out_ref, *, preemph,
            n_bins, log_eps):
    x = frames_ref[:]                                   # (R, flen)
    x = x - jnp.mean(x, axis=-1, keepdims=True)         # remove DC offset
    prev = jnp.concatenate([x[:, :1], x[:, :-1]], axis=-1)
    x = (x - preemph * prev) * window_ref[:]            # preemph + povey
    # HIGHEST keeps full fp32 MXU passes for the DFT, which has heavy
    # cancellation (low-energy bins would otherwise be corrupted); the mel
    # matmul sums non-negative values — no cancellation — so default
    # precision is safe there and faster
    spec = jnp.dot(x, rdft_ref[:], preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    power = spec[:, :n_bins] ** 2 + spec[:, n_bins:] ** 2
    mels = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = jnp.log(jnp.maximum(mels, log_eps))


@functools.partial(jax.jit, static_argnames=("sr", "n_mels", "frame_length",
                                             "frame_shift", "interpret"))
def fbank_pallas(waveforms, sr: int = 16000, n_mels: int = 80,
                 frame_length: float = 25.0, frame_shift: float = 10.0,
                 interpret: bool = False):
    """Batched kaldi fbank ``(B, L) -> (B, T, n_mels)``, fused on TPU.

    Defaults (povey window, preemph 0.97, DC removal, power spectrum,
    low 20 Hz / high Nyquist, dither 0) mirror ``kaldi.fbank``.
    """
    waveforms = jnp.asarray(waveforms, jnp.float32)
    b, num_samples = waveforms.shape
    frame_len = int(sr * frame_length / 1000.0)
    shift = int(sr * frame_shift / 1000.0)
    n_fft = kaldi.next_power_of_two(frame_len)
    n_bins = n_fft // 2 + 1
    t = kaldi.num_frames_snip_edges(num_samples, frame_len, shift)

    frames = kaldi.frame_signal(waveforms, frame_len, shift)  # (B,T,flen)
    rows = b * t
    pad_rows = (-rows) % _ROW_TILE
    flat = frames.reshape(rows, frame_len)
    if pad_rows:
        flat = jnp.concatenate(
            [flat, jnp.zeros((pad_rows, frame_len), jnp.float32)])

    rdft = jnp.asarray(kaldi._rdft_np(frame_len, n_fft))
    mel = jnp.asarray(kaldi._kaldi_mel_banks_np(n_mels, n_fft, sr))
    window = jnp.asarray(kaldi._window_np("povey", frame_len))[None, :]

    kernel = functools.partial(
        _kernel, preemph=0.97, n_bins=n_bins,
        log_eps=float(np.finfo(np.float32).eps))
    grid = (flat.shape[0] // _ROW_TILE,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_ROW_TILE, frame_len), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, frame_len), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((frame_len, 2 * n_bins), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bins, n_mels), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROW_TILE, n_mels), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((flat.shape[0], n_mels), jnp.float32),
        interpret=interpret,
    )(flat, window, rdft, mel)
    return out[:rows].reshape(b, t, n_mels)
