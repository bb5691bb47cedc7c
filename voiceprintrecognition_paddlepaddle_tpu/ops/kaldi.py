"""Kaldi-compatible Fbank, computed as MXU matmuls (no FFT).

The reference computes Fbank on CPU one utterance at a time through
``paddleaudio.compliance.kaldi.fbank`` (reference
``ppvector/data_utils/featurizer.py:83-101``, defaults: 25 ms/10 ms frames,
povey window, snip_edges, dither 0, preemphasis 0.97, DC removal, power
spectrum, log-mel with low 20 Hz / high Nyquist). This module reproduces
that math as a *batched on-device* op designed for the TPU:

- framing is a strided gather producing ``(B, T, frame_len)``;
- the windowed frames hit the MXU twice — a real-DFT matmul
  ``(frame_len → 2*(n_fft/2+1))`` and a mel matmul ``(n_fft/2+1 → n_mels)``.
  For the small n_fft used in speech (512), dense matmul beats FFT on the
  systolic array and fuses with the surrounding elementwise ops.

All functions are pure and jittable; shapes are static in ``frame_len`` /
``n_fft`` / ``n_mels`` so XLA tiles them once.
"""

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fbank", "frame_signal", "povey_window", "kaldi_mel_banks",
           "num_frames_snip_edges"]

# float32 machine epsilon: kaldi floors mel energies here before the log
_LOG_EPS = float(np.finfo(np.float32).eps)


def next_power_of_two(n: int) -> int:
    return 1 << (int(n) - 1).bit_length()


def num_frames_snip_edges(num_samples: int, frame_len: int, frame_shift: int) -> int:
    if num_samples < frame_len:
        return 0
    return 1 + (num_samples - frame_len) // frame_shift


@lru_cache(maxsize=None)
def _window_np(window_type: str, n: int, blackman_coeff: float = 0.42):
    a = 2 * math.pi / (n - 1)
    k = np.arange(n, dtype=np.float64)
    if window_type == "povey":
        w = (0.5 - 0.5 * np.cos(a * k)) ** 0.85
    elif window_type == "hanning":
        w = 0.5 - 0.5 * np.cos(a * k)
    elif window_type == "hamming":
        w = 0.54 - 0.46 * np.cos(a * k)
    elif window_type == "rectangular":
        w = np.ones(n)
    elif window_type == "blackman":
        w = (blackman_coeff - 0.5 * np.cos(a * k)
             + (0.5 - blackman_coeff) * np.cos(2 * a * k))
    else:
        raise ValueError(f"unknown window type {window_type}")
    return w.astype(np.float32)


def povey_window(n: int):
    return jnp.asarray(_window_np("povey", n))


@lru_cache(maxsize=None)
def _rdft_np(frame_len: int, n_fft: int):
    """Real-DFT basis restricted to the first ``frame_len`` samples.

    Multiplying frames ``(.., frame_len)`` by this ``(frame_len, 2*n_bins)``
    matrix equals zero-padding each frame to ``n_fft`` and taking rfft;
    columns are [cos | -sin] so power = c^2 + s^2.
    """
    n_bins = n_fft // 2 + 1
    j = np.arange(frame_len)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = 2 * math.pi * j * k / n_fft
    mat = np.concatenate([np.cos(ang), -np.sin(ang)], axis=1)
    return mat.astype(np.float32)


def _mel_scale(freq):
    return 1127.0 * np.log(1.0 + freq / 700.0)


@lru_cache(maxsize=None)
def _kaldi_mel_banks_np(n_mels: int, n_fft: int, sample_rate: int,
                        low_freq: float = 20.0, high_freq: float = 0.0,
                        vtln_warp: float = 1.0):
    """Kaldi mel filterbank over rfft bins, shape ``(n_fft//2+1, n_mels)``.

    Triangles are linear in kaldi-mel (1127·ln(1+f/700)); the Nyquist bin row
    is zero, matching kaldi's bank over ``n_fft/2`` bins.
    """
    assert vtln_warp == 1.0, "VTLN warping not implemented"
    if high_freq <= 0.0:
        high_freq = sample_rate / 2.0 + high_freq
    assert 0.0 <= low_freq < high_freq <= sample_rate / 2.0
    n_bins = n_fft // 2
    fft_bin_width = sample_rate / n_fft
    mel_low = _mel_scale(low_freq)
    mel_high = _mel_scale(high_freq)
    mel_delta = (mel_high - mel_low) / (n_mels + 1)

    bin_mels = _mel_scale(fft_bin_width * np.arange(n_bins))[None, :]
    left = mel_low + np.arange(n_mels)[:, None] * mel_delta
    center = left + mel_delta
    right = center + mel_delta
    up = (bin_mels - left) / (center - left)
    down = (right - bin_mels) / (right - center)
    bank = np.maximum(0.0, np.minimum(up, down))
    bank = np.concatenate([bank, np.zeros((n_mels, 1))], axis=1)  # nyquist
    return bank.T.astype(np.float32)  # (n_fft//2+1, n_mels)


def kaldi_mel_banks(n_mels, n_fft, sample_rate, low_freq=20.0, high_freq=0.0):
    return jnp.asarray(_kaldi_mel_banks_np(n_mels, n_fft, sample_rate,
                                           low_freq, high_freq))


def frame_signal(waveforms, frame_len: int, frame_shift: int):
    """Strided framing: ``(B, L) -> (B, T, frame_len)`` with snip_edges.

    Built from whole-row slices of a ``(.., T+q, shift)`` reshape rather
    than a scalar gather: frame ``t`` is the concatenation of rows
    ``t..t+q-1`` plus the first ``r`` columns of row ``t+q`` where
    ``frame_len = q*shift + r``. Slice+concat lowers to plain copies on
    TPU (the element gather was ~4x slower than the DFT it feeds).
    """
    num_samples = waveforms.shape[-1]
    t = num_frames_snip_edges(num_samples, frame_len, frame_shift)
    q, r = divmod(frame_len, frame_shift)
    need = (t + q) * frame_shift
    w = waveforms[..., :min(num_samples, need)]
    if need > w.shape[-1]:
        pad = [(0, 0)] * (w.ndim - 1) + [(0, need - w.shape[-1])]
        w = jnp.pad(jnp.asarray(w), pad)
    rows = jnp.asarray(w).reshape(*w.shape[:-1], t + q, frame_shift)
    pieces = [rows[..., j:j + t, :] for j in range(q)]
    if r:
        pieces.append(rows[..., q:q + t, :r])
    return jnp.concatenate(pieces, axis=-1)


def fbank(waveforms,
          sr: int = 16000,
          n_mels: int = 23,
          frame_length: float = 25.0,
          frame_shift: float = 10.0,
          dither: float = 0.0,
          energy_floor: float = 1.0,
          low_freq: float = 20.0,
          high_freq: float = 0.0,
          preemphasis_coefficient: float = 0.97,
          remove_dc_offset: bool = True,
          round_to_power_of_two: bool = True,
          snip_edges: bool = True,
          use_log_fbank: bool = True,
          use_power: bool = True,
          window_type: str = "povey",
          blackman_coeff: float = 0.42,
          rng: "jax.Array | None" = None):
    """Batched kaldi fbank: ``(B, L) float32 -> (B, T, n_mels)``.

    Defaults mirror ``paddleaudio.compliance.kaldi.fbank`` (which mirrors
    kaldi ``compute-fbank-feats``); dither requires an explicit PRNG key.
    """
    assert snip_edges, "only snip_edges=True (kaldi default) is supported"
    waveforms = jnp.asarray(waveforms, dtype=jnp.float32)
    squeeze = waveforms.ndim == 1
    if squeeze:
        waveforms = waveforms[None]

    frame_len = int(sr * frame_length / 1000.0)
    shift = int(sr * frame_shift / 1000.0)
    n_fft = next_power_of_two(frame_len) if round_to_power_of_two else frame_len

    frames = frame_signal(waveforms, frame_len, shift)  # (B, T, flen)
    if dither != 0.0:
        if rng is None:
            raise ValueError("dither > 0 requires a PRNG key")
        frames = frames + dither * jax.random.normal(rng, frames.shape)
    if remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if preemphasis_coefficient != 0.0:
        prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - preemphasis_coefficient * prev
    frames = frames * jnp.asarray(_window_np(window_type, frame_len, blackman_coeff))

    # real DFT + power spectrum, both MXU matmuls. HIGHEST precision keeps
    # the MXU in full fp32 passes — the DFT has heavy cancellation and the
    # default bf16-ish matmul precision would corrupt low-energy bins.
    rdft = jnp.asarray(_rdft_np(frame_len, n_fft))
    spec = jnp.matmul(frames, rdft, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    n_bins = n_fft // 2 + 1
    power = spec[..., :n_bins] ** 2 + spec[..., n_bins:] ** 2
    if not use_power:
        power = jnp.sqrt(power)

    mel = jnp.asarray(_kaldi_mel_banks_np(n_mels, n_fft, sr, low_freq, high_freq))
    feats = jnp.matmul(power, mel, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    if use_log_fbank:
        feats = jnp.log(jnp.maximum(feats, _LOG_EPS))
    return feats[0] if squeeze else feats
