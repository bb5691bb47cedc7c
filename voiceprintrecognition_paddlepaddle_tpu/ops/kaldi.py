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
           "num_frames_snip_edges", "num_frames_kaldi"]

# float32 machine epsilon: kaldi floors mel energies here before the log
_LOG_EPS = float(np.finfo(np.float32).eps)


def next_power_of_two(n: int) -> int:
    return 1 << (int(n) - 1).bit_length()


def num_frames_snip_edges(num_samples: int, frame_len: int, frame_shift: int) -> int:
    if num_samples < frame_len:
        return 0
    return 1 + (num_samples - frame_len) // frame_shift


def num_frames_kaldi(num_samples: int, frame_len: int, frame_shift: int,
                     snip_edges: bool = True) -> int:
    """Frame count for either edge mode (kaldi feature-window.h
    NumFrames): snip_edges drops partial frames; otherwise frames are
    centred every ``frame_shift`` with reflected edges."""
    if snip_edges:
        return num_frames_snip_edges(num_samples, frame_len, frame_shift)
    return (num_samples + frame_shift // 2) // frame_shift


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


def _inverse_mel_scale(mel):
    return 700.0 * (np.exp(mel / 1127.0) - 1.0)


def _vtln_warp_freq(vtln_low_cutoff, vtln_high_cutoff, low_freq, high_freq,
                    vtln_warp_factor, freq):
    """Kaldi's piecewise-linear VTLN frequency warp
    (mel-computations.cc VtlnWarpFreq): identity outside
    [low_freq, high_freq], slope 1/warp in the middle band, linear
    interpolation at the edges so the endpoints are fixed."""
    assert vtln_low_cutoff > low_freq, \
        "vtln_low must be greater than low_freq"
    assert vtln_high_cutoff < high_freq, \
        "vtln_high (after +nyquist) must be less than high_freq"
    freq = np.asarray(freq, np.float64)
    l = vtln_low_cutoff * max(1.0, vtln_warp_factor)
    h = vtln_high_cutoff * min(1.0, vtln_warp_factor)
    assert l > low_freq and h < high_freq
    scale = 1.0 / vtln_warp_factor
    fl = scale * l
    fh = scale * h
    scale_left = (fl - low_freq) / (l - low_freq)
    scale_right = (high_freq - fh) / (high_freq - h)
    res = np.where(freq < h, scale * freq,
                   high_freq + scale_right * (freq - high_freq))
    res = np.where(freq < l, low_freq + scale_left * (freq - low_freq), res)
    return np.where((freq < low_freq) | (freq > high_freq), freq, res)


def _vtln_warp_mel(vtln_low, vtln_high, low_freq, high_freq, warp, mel):
    return _mel_scale(_vtln_warp_freq(vtln_low, vtln_high, low_freq,
                                      high_freq, warp,
                                      _inverse_mel_scale(mel)))


@lru_cache(maxsize=None)
def _kaldi_mel_banks_np(n_mels: int, n_fft: int, sample_rate: int,
                        low_freq: float = 20.0, high_freq: float = 0.0,
                        vtln_warp: float = 1.0, vtln_low: float = 100.0,
                        vtln_high: float = -500.0):
    """Kaldi mel filterbank over rfft bins, shape ``(n_fft//2+1, n_mels)``.

    Triangles are linear in kaldi-mel (1127·ln(1+f/700)); the Nyquist bin row
    is zero, matching kaldi's bank over ``n_fft/2`` bins. ``vtln_warp != 1``
    applies kaldi's piecewise-linear VTLN warp to each triangle's
    left/center/right mel points (mel-computations.cc MelBanks).
    """
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
    if vtln_warp != 1.0:
        if vtln_high < 0.0:
            vtln_high += sample_rate / 2.0
        warp = lambda m: _vtln_warp_mel(vtln_low, vtln_high, low_freq,
                                        high_freq, vtln_warp, m)
        left, center, right = warp(left), warp(center), warp(right)
    up = (bin_mels - left) / (center - left)
    down = (right - bin_mels) / (right - center)
    bank = np.maximum(0.0, np.minimum(up, down))
    bank = np.concatenate([bank, np.zeros((n_mels, 1))], axis=1)  # nyquist
    return bank.T.astype(np.float32)  # (n_fft//2+1, n_mels)


def kaldi_mel_banks(n_mels, n_fft, sample_rate, low_freq=20.0, high_freq=0.0):
    return jnp.asarray(_kaldi_mel_banks_np(n_mels, n_fft, sample_rate,
                                           low_freq, high_freq))


def frame_signal(waveforms, frame_len: int, frame_shift: int,
                 snip_edges: bool = True):
    """Strided framing: ``(B, L) -> (B, T, frame_len)``.

    Built from whole-row slices of a ``(.., T+q, shift)`` reshape rather
    than a scalar gather: frame ``t`` is the concatenation of rows
    ``t..t+q-1`` plus the first ``r`` columns of row ``t+q`` where
    ``frame_len = q*shift + r``. Slice+concat lowers to plain copies on
    TPU (the element gather was ~4x slower than the DFT it feeds).

    ``snip_edges=False`` centres a frame every ``frame_shift`` samples
    and reflects the signal at both edges (kaldi feature-window.cc
    ExtractWindow), then reuses the same strided framing.
    """
    if not snip_edges:
        waveforms = jnp.asarray(waveforms, jnp.float32)
        L = waveforms.shape[-1]
        m = num_frames_kaldi(L, frame_len, frame_shift, snip_edges=False)
        pad = frame_len // 2 - frame_shift // 2
        assert pad >= 0, "snip_edges=False requires frame_len >= frame_shift"
        need_right = (m - 1) * frame_shift + frame_len - pad - L
        assert 0 <= pad <= L and need_right <= L, \
            "clip too short for snip_edges=False framing"
        left = jnp.flip(waveforms[..., :pad], axis=-1)
        right = jnp.flip(waveforms, axis=-1)[..., :max(need_right, 0)]
        waveforms = jnp.concatenate([left, waveforms, right], axis=-1)
        frame_len_total = (m - 1) * frame_shift + frame_len
        waveforms = waveforms[..., :frame_len_total]

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
          use_energy: bool = False,
          raw_energy: bool = True,
          htk_compat: bool = False,
          vtln_warp: float = 1.0,
          vtln_low: float = 100.0,
          vtln_high: float = -500.0,
          rng: "jax.Array | None" = None):
    """Batched kaldi fbank: ``(B, L) float32 -> (B, T, n_mels)``
    (``n_mels + 1`` with ``use_energy``).

    Defaults mirror ``paddleaudio.compliance.kaldi.fbank`` (which mirrors
    kaldi ``compute-fbank-feats``); dither requires an explicit PRNG key.
    Full option surface of the reference's ``method_args`` passthrough
    (reference ``ppvector/data_utils/featurizer.py:83-101``): both edge
    modes, frame energy (raw or windowed, htk-compatible placement) and
    VTLN warping.
    """
    waveforms = jnp.asarray(waveforms, dtype=jnp.float32)
    squeeze = waveforms.ndim == 1
    if squeeze:
        waveforms = waveforms[None]

    frame_len = int(sr * frame_length / 1000.0)
    shift = int(sr * frame_shift / 1000.0)
    n_fft = next_power_of_two(frame_len) if round_to_power_of_two else frame_len

    frames = frame_signal(waveforms, frame_len, shift,
                          snip_edges=snip_edges)  # (B, T, flen)
    if dither != 0.0:
        if rng is None:
            raise ValueError("dither > 0 requires a PRNG key")
        frames = frames + dither * jax.random.normal(rng, frames.shape)
    if remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)

    def _log_energy(x):
        e = jnp.maximum(jnp.sum(x * x, axis=-1), _LOG_EPS)
        e = jnp.log(e)
        if energy_floor > 0.0:
            e = jnp.maximum(e, math.log(energy_floor))
        return e

    energy = _log_energy(frames) if (use_energy and raw_energy) else None
    if preemphasis_coefficient != 0.0:
        prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - preemphasis_coefficient * prev
    frames = frames * jnp.asarray(_window_np(window_type, frame_len, blackman_coeff))
    if use_energy and not raw_energy:
        energy = _log_energy(frames)

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

    mel = jnp.asarray(_kaldi_mel_banks_np(n_mels, n_fft, sr, low_freq,
                                          high_freq, vtln_warp, vtln_low,
                                          vtln_high))
    feats = jnp.matmul(power, mel, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    if use_log_fbank:
        feats = jnp.log(jnp.maximum(feats, _LOG_EPS))
    if use_energy:
        # htk_compat appends the energy column, kaldi-style prepends it
        cols = ([feats, energy[..., None]] if htk_compat
                else [energy[..., None], feats])
        feats = jnp.concatenate(cols, axis=-1)
    return feats[0] if squeeze else feats
