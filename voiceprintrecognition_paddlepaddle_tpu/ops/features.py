"""On-device audio feature front-end (Fbank / MFCC / Mel / LogMel / Spectrogram).

Replaces the reference's CPU-worker feature path (reference
``ppvector/data_utils/featurizer.py:7-101``, which wraps
``paddle.audio.features`` and loops per-utterance for Kaldi fbank) with pure
batched JAX ops: one jitted call featurizes a whole padded batch on the TPU
and fuses into the training step.

Output convention matches the reference featurizer: ``(B, T, F)`` with
per-utterance cepstral mean normalisation (``featurizer.py:48``) and optional
length-ratio masking (``featurizer.py:49-59``). One deliberate improvement:
when a mask is provided, the CMN mean is computed over *valid* frames only
(the reference includes padding frames in the mean, which makes padded eval
batches statistically different from training crops).

Spectrogram/Mel/LogMel/MFCC parameter defaults mirror
``paddle.audio.features`` (n_fft 512, hann, centre/reflect, slaney mel,
f_min 50); Fbank mirrors ``paddleaudio.compliance.kaldi.fbank``.
"""

import math
import os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from . import kaldi

__all__ = ["AudioFeaturizer", "spectrogram", "mel_spectrogram",
           "log_mel_spectrogram", "mfcc", "compute_feature", "apply_cmn_and_mask"]


# ----------------------------------------------------------------------
# mel / dct helper matrices (host-side, cached)
# ----------------------------------------------------------------------
def _hz_to_mel(f, htk=False):
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
                    mels)


def _mel_to_hz(m, htk=False):
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)),
                    freqs)


@lru_cache(maxsize=None)
def _slaney_mel_banks_np(sr, n_fft, n_mels, f_min, f_max, htk, norm):
    """librosa/paddle-style mel filterbank: ``(n_fft//2+1, n_mels)``."""
    if f_max is None:
        f_max = sr / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sr / 2.0, n_bins)
    mel_pts = np.linspace(_hz_to_mel(f_min, htk), _hz_to_mel(f_max, htk), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts, htk)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1][:, None]
    upper = ramps[2:] / fdiff[1:][:, None]
    weights = np.maximum(0, np.minimum(lower, upper))
    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2:n_mels + 2] - hz_pts[:n_mels])
        weights *= enorm[:, None]
    return weights.T.astype(np.float32)


@lru_cache(maxsize=None)
def _dct_matrix_np(n_mfcc, n_mels):
    """DCT-II with 'ortho' norm: ``(n_mels, n_mfcc)``."""
    n = np.arange(n_mels)[:, None]
    k = np.arange(n_mfcc)[None, :]
    mat = np.cos(math.pi * (2 * n + 1) * k / (2 * n_mels)) * math.sqrt(2.0 / n_mels)
    mat[:, 0] = math.sqrt(1.0 / n_mels)
    return mat.astype(np.float32)


@lru_cache(maxsize=None)
def _hann_np(n):
    return (0.5 - 0.5 * np.cos(2 * math.pi * np.arange(n) / n)).astype(np.float32)


# ----------------------------------------------------------------------
# centred STFT as matmul (hot path — MXU)
# ----------------------------------------------------------------------
def _stft_power(waveforms, n_fft, hop_length, win_length, window, center,
                pad_mode, power):
    """``(B, L) -> (B, T, n_fft//2+1)`` magnitude**power spectrogram."""
    if win_length is None:
        win_length = n_fft
    if hop_length is None:
        hop_length = win_length // 4
    if center:
        pad = n_fft // 2
        waveforms = jnp.pad(waveforms, ((0, 0), (pad, pad)), mode=pad_mode)
    frames = kaldi.frame_signal(waveforms, n_fft, hop_length)
    if window == "hann":
        win = jnp.asarray(_hann_np(win_length))
    else:
        win = jnp.asarray(kaldi._window_np(window, win_length))
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        win = jnp.pad(win, (lpad, n_fft - win_length - lpad))
    frames = frames * win
    rdft = jnp.asarray(kaldi._rdft_np(n_fft, n_fft))
    spec = jnp.matmul(frames, rdft, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    n_bins = n_fft // 2 + 1
    mag_sq = spec[..., :n_bins] ** 2 + spec[..., n_bins:] ** 2
    if power == 2.0:
        return mag_sq
    if power == 1.0:
        return jnp.sqrt(jnp.maximum(mag_sq, 0.0))
    return jnp.power(jnp.maximum(mag_sq, 1e-30), power / 2.0)


def spectrogram(waveforms, sr=16000, n_fft=512, hop_length=None,
                win_length=None, window="hann", power=1.0, center=True,
                pad_mode="reflect"):
    """``paddle.audio.features.Spectrogram`` equivalent: (B,T,n_fft//2+1)."""
    return _stft_power(waveforms, n_fft, hop_length, win_length, window,
                       center, pad_mode, power)


def mel_spectrogram(waveforms, sr=16000, n_fft=512, hop_length=None,
                    win_length=None, window="hann", power=2.0, center=True,
                    pad_mode="reflect", n_mels=64, f_min=50.0, f_max=None,
                    htk=False, norm="slaney"):
    """``paddle.audio.features.MelSpectrogram`` equivalent: (B,T,n_mels)."""
    spec = _stft_power(waveforms, n_fft, hop_length, win_length, window,
                       center, pad_mode, power)
    mel = jnp.asarray(_slaney_mel_banks_np(sr, n_fft, n_mels, f_min, f_max,
                                           htk, norm))
    return jnp.matmul(spec, mel, preferred_element_type=jnp.float32)


def _power_to_db(x, ref_value=1.0, amin=1e-10, top_db=None):
    db = 10.0 * jnp.log10(jnp.maximum(x, amin))
    db -= 10.0 * jnp.log10(jnp.maximum(jnp.asarray(ref_value), amin))
    if top_db is not None:
        db = jnp.maximum(db, db.max() - top_db)
    return db


def log_mel_spectrogram(waveforms, sr=16000, ref_value=1.0, amin=1e-10,
                        top_db=None, **mel_kwargs):
    """``paddle.audio.features.LogMelSpectrogram`` equivalent."""
    mel_kwargs.setdefault("n_mels", 128)
    m = mel_spectrogram(waveforms, sr=sr, **mel_kwargs)
    return _power_to_db(m, ref_value, amin, top_db)


def mfcc(waveforms, sr=16000, n_mfcc=40, norm="ortho", ref_value=1.0,
         amin=1e-10, top_db=None, **mel_kwargs):
    """``paddle.audio.features.MFCC`` equivalent: DCT-II of log-mel dB."""
    assert norm == "ortho"
    mel_kwargs.setdefault("n_mels", 64)
    logmel = log_mel_spectrogram(waveforms, sr=sr, ref_value=ref_value,
                                 amin=amin, top_db=top_db, **mel_kwargs)
    dct = jnp.asarray(_dct_matrix_np(n_mfcc, logmel.shape[-1]))
    return jnp.matmul(logmel, dct, preferred_element_type=jnp.float32)


def _fbank_kernel_eligible(use_pallas, kwargs):
    """True when the fused Pallas fbank kernel handles this configuration
    (standard kaldi options on a TPU backend; any extra kaldi arg —
    including ``dither`` — needs the jnp path).

    ``VPR_FBANK_PALLAS=0`` force-disables the kernel regardless of backend
    — bench.py's "pure XLA" degradation rung and any part where the kernel
    fails to lower rely on this escape hatch."""
    if os.environ.get("VPR_FBANK_PALLAS", "1") == "0":
        return False
    standard = not kwargs
    if use_pallas == "auto":
        use_pallas = standard and jax.default_backend() == "tpu"
    return bool(use_pallas and standard)


def _fbank_dispatch(waveforms, sr=16000, n_mels=23, use_pallas="auto",
                    rng=None, **kwargs):
    """Fbank entry: routes standard configurations to the fused Pallas
    kernel on TPU (4-5x faster than the jnp matmul path on v5e), falling
    back to ``kaldi.fbank`` for CPU or non-default kaldi options (including
    ``dither``, which needs the PRNG key ``rng``)."""
    if _fbank_kernel_eligible(use_pallas, kwargs):
        from .pallas_fbank import fbank_pallas
        return fbank_pallas(waveforms, sr=sr, n_mels=n_mels)
    return kaldi.fbank(waveforms, sr=sr, n_mels=n_mels, rng=rng, **kwargs)


_METHODS = {
    "Fbank": (_fbank_dispatch, dict(n_mels=23)),
    "MFCC": (mfcc, dict(n_mfcc=40)),
    "MelSpectrogram": (mel_spectrogram, dict(n_mels=64)),
    "LogMelSpectrogram": (log_mel_spectrogram, dict(n_mels=128)),
    "Spectrogram": (spectrogram, dict()),
}


def apply_cmn_and_mask(feature, input_lens_ratio=None):
    """Per-utterance CMN over time + zero the padded tail.

    Matches reference ``featurizer.py:46-59`` semantics, except the mean is
    masked when lengths are given (see module docstring).
    """
    t = feature.shape[1]
    if input_lens_ratio is None:
        return feature - jnp.mean(feature, axis=1, keepdims=True)
    input_lens = (input_lens_ratio * t).astype(jnp.int32)
    idx = jnp.arange(t)[None, :, None]
    mask = idx < input_lens[:, None, None]
    denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1)
    mean = jnp.sum(jnp.where(mask, feature, 0.0), axis=1, keepdims=True) / denom
    return jnp.where(mask, feature - mean, 0.0)


def compute_feature(waveforms, feature_method="MelSpectrogram",
                    input_lens_ratio=None, rng=None, **method_args):
    """Pure function: padded waveforms ``(B, L)`` -> features ``(B, T, F)``.

    ``rng`` is consumed only by Fbank's ``dither`` (reference accepts
    ``dither`` via ``method_args``, ``featurizer.py:83-101``)."""
    fn, defaults = _METHODS[feature_method]
    kwargs = dict(defaults)
    kwargs.update(method_args)
    if feature_method == "Fbank":
        # CMN stays a separate XLA op: folding it into the Pallas kernel's
        # final pass was device-measured SLOWER (1.66 vs 1.53 ms/iter at
        # b256 x 3 s) and less precise — see ROADMAP "Measured decisions"
        kwargs["rng"] = rng
    feature = fn(waveforms, **kwargs)
    return apply_cmn_and_mask(feature, input_lens_ratio)


class AudioFeaturizer:
    """Batched, jitted featurizer (API of reference ``featurizer.py:7-80``).

    ``__call__(waveforms, input_lens_ratio=None)`` accepts numpy or jax
    arrays of shape ``(L,)`` or ``(B, L)`` and returns ``(B, T, F)``.
    The underlying pure function is exposed as ``.featurize`` for fusion
    inside a jitted train step.
    """

    def __init__(self, feature_method="MelSpectrogram", method_args=None):
        method_args = dict(method_args or {})
        if feature_method not in _METHODS:
            raise ValueError(f"unknown feature method: {feature_method}")
        self._feature_method = feature_method
        self._method_args = method_args
        # the reference config passes `sr`; normalise the key
        if "sr" not in method_args:
            method_args["sr"] = 16000
        self.dither = (float(method_args.get("dither", 0.0))
                       if feature_method == "Fbank" else 0.0)
        self.featurize = partial(compute_feature, feature_method=feature_method,
                                 **method_args)
        self._jit_featurize = jax.jit(self.featurize)
        self._jit_featurize_masked = jax.jit(
            lambda w, r: self.featurize(w, input_lens_ratio=r))
        self._jit_featurize_rng = jax.jit(
            lambda w, r, k: self.featurize(w, input_lens_ratio=r, rng=k))

    def __call__(self, waveforms, input_lens_ratio=None, rng=None):
        waveforms = jnp.asarray(waveforms, dtype=jnp.float32)
        if waveforms.ndim == 1:
            waveforms = waveforms[None]
        if self.dither > 0:
            # fresh per-call dither noise, matching kaldi's non-deterministic
            # dither when no explicit key is given
            if rng is None:
                rng = jax.random.PRNGKey(np.random.randint(0, 2 ** 31))
            return self._jit_featurize_rng(
                waveforms,
                (jnp.ones((waveforms.shape[0],), jnp.float32)
                 if input_lens_ratio is None
                 else jnp.asarray(input_lens_ratio, jnp.float32)), rng)
        if input_lens_ratio is None:
            return self._jit_featurize(waveforms)
        return self._jit_featurize_masked(
            waveforms, jnp.asarray(input_lens_ratio, dtype=jnp.float32))

    @property
    def feature_dim(self):
        """Feature size (reference ``featurizer.py:62-80``)."""
        m, args = self._feature_method, self._method_args
        if m == "LogMelSpectrogram":
            return args.get("n_mels", 128)
        if m == "MelSpectrogram":
            return args.get("n_mels", 64)
        if m == "Spectrogram":
            return args.get("n_fft", 512) // 2 + 1
        if m == "MFCC":
            return args.get("n_mfcc", 40)
        if m == "Fbank":
            # use_energy adds a frame-energy column (the reference's
            # feature_dim ignores it and would crash downstream)
            return (args.get("n_mels", 23)
                    + (1 if args.get("use_energy", False) else 0))
        raise ValueError(m)

    @property
    def feature_method(self):
        return self._feature_method

    def num_frames(self, num_samples: int) -> int:
        """Exact frame count this featurizer yields for ``num_samples``
        valid samples — used for length-ratio masks and to trim padded
        outputs back to their true length."""
        a = self._method_args
        sr = a.get("sr", 16000)
        if self._feature_method == "Fbank":
            fl = int(sr * a.get("frame_length", 25.0) / 1000)
            fs = int(sr * a.get("frame_shift", 10.0) / 1000)
            return kaldi.num_frames_kaldi(
                num_samples, fl, fs,
                snip_edges=a.get("snip_edges", True))
        n_fft = a.get("n_fft", 512)
        win = a.get("win_length") or n_fft
        hop = a.get("hop_length") or win // 4
        return 1 + num_samples // hop
