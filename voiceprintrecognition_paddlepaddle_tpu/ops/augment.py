"""Audio augmentation: host-side speed perturb + on-device batched augments.

Replaces the five ``yeaudio.augmentation`` augmentors the reference applies
per-sample on CPU workers (reference ``ppvector/data_utils/reader.py:141-163``:
speed → volume → noise → reverb on the waveform, SpecAugment on the
feature). TPU-first split:

- **speed perturb** changes length, so it runs on the host during decode
  (linear-interp resample; optional 3-class label expansion
  ``spk_id*3 + {0,1,2}``, consumed like reference ``reader.py:156`` /
  ``trainer.py:171-173``);
- **volume / noise / reverb / dB-normalisation / SpecAugment** are pure
  batched JAX functions on fixed-shape ``(B, L)`` waveforms / ``(B, T, F)``
  features, drawing randomness from an explicit PRNG key, so they fuse into
  the jitted train step. Noise and RIR clips are preloaded banks on device.
"""

import os
import random

import jax
import jax.numpy as jnp
import numpy as np

from .audio import AudioSegment

__all__ = ["SpeedPerturbAugmentor", "DeviceAugmenter", "AudioBank",
           "load_audio_bank", "spec_augment", "mix_noise", "apply_reverb",
           "normalize_db", "rms_db"]


# ----------------------------------------------------------------------
# host-side: speed perturbation (changes length)
# ----------------------------------------------------------------------
class SpeedPerturbAugmentor:
    """Random speed in {0.9, 1.0, 1.1} via polyphase resampling.

    yeaudio-equivalent used at reference ``reader.py:141-151``; with
    ``speed_perturb_3_class`` the label becomes ``spk_id * 3 + idx`` and the
    classifier grows 3x (reference ``trainer.py:169-173``). Resampling is
    ``scipy.signal.resample_poly`` (anti-aliased; at 1.1x a linear interp
    aliases the top octave) with a linear-interp fallback when scipy is
    unavailable; output length is exactly ``int(len / speed)``.
    """

    SPEEDS = (1.0, 0.9, 1.1)
    # up/down polyphase ratios for 1/speed
    _RATIOS = {0.9: (10, 9), 1.1: (10, 11)}

    def __init__(self, prob=1.0, speed_perturb_3_class=False,
                 num_speakers=None, **kwargs):
        self.prob = prob
        self.speed_perturb_3_class = speed_perturb_3_class
        self.num_speakers = num_speakers

    @classmethod
    def resample(cls, samples, speed):
        """Time-stretch by 1/speed with anti-aliasing: the native Kaiser
        polyphase resampler when available (GIL-free), scipy
        ``resample_poly`` otherwise."""
        old_len = len(samples)
        new_len = int(old_len / speed)
        up, down = cls._RATIOS[speed]
        from ..native import resample_native
        out = resample_native(np.asarray(samples, np.float32), down, up)
        if out is None:
            try:
                from scipy.signal import resample_poly
                out = resample_poly(np.asarray(samples, np.float64),
                                    up, down)
            except ImportError:  # pragma: no cover - scipy in the image
                old_idx = np.linspace(0, old_len - 1, new_len)
                return np.interp(old_idx, np.arange(old_len),
                                 samples).astype(np.float32)
        if len(out) < new_len:
            out = np.pad(out, (0, new_len - len(out)))
        return out[:new_len].astype(np.float32)

    def sample(self, spk_id, rng: random.Random = random):
        """Draw the per-item policy once: ``(num, den, spk_id)`` where
        the item's playback speed is ``num/den`` ((9, 10) = 0.9x) and
        spk_id is expanded for 3-class perturbation. The single source
        of truth for the prob/speed/label policy — used by both
        ``__call__`` (per-item path) and the C++ batch loader
        (``reader.load_batch``), which must never diverge."""
        if rng.random() >= self.prob:
            return 1, 1, spk_id
        idx = rng.randint(0, 2)
        speed = self.SPEEDS[idx]
        if self.speed_perturb_3_class:
            spk_id = spk_id * 3 + idx
        if speed == 1.0:
            return 1, 1, spk_id
        up, down = self._RATIOS[speed]
        return down, up, spk_id

    def __call__(self, samples, spk_id, rng: random.Random = random):
        num, den, spk_id = self.sample(spk_id, rng)
        if num != den:
            samples = self.resample(samples, num / den)
        return samples, spk_id


class AudioBank:
    """A refreshable fixed-shape ``(N, L)`` device bank of audio clips for
    on-device noise/reverb augmentation.

    The reference draws a random file AND a random segment per training
    sample from the whole corpus (yeaudio NoisePerturb/ReverbPerturb at
    reference ``reader.py:154-163``). Device-side we keep a fixed-shape
    bank (static shapes for jit) and recover the reference's coverage with
    two mechanisms: a per-sample random circular offset applied on device
    (segment coverage within a clip), and — for corpora larger than
    ``max_clips`` — a per-epoch ``refresh`` that reloads a different
    random subset of files with a random crop window each (file + segment
    coverage across epochs).

    ``pad_mode``: "tile" repeats short clips (noise); "zero" zero-pads
    (RIRs — tiling an impulse response would fabricate echoes).
    """

    def __init__(self, audio_dir, sample_rate, clip_seconds, max_clips=256,
                 pad_mode="tile", seed=0):
        self.paths = sorted(
            os.path.join(audio_dir, f) for f in os.listdir(audio_dir)
            if f.lower().endswith((".wav", ".flac")))
        self.sample_rate = sample_rate
        self.length = int(clip_seconds * sample_rate)
        self.max_clips = int(max_clips)
        self.pad_mode = pad_mode
        self.seed = seed
        self._bank = None
        self._epoch = None

    def __bool__(self):
        return bool(self.paths)

    @property
    def needs_refresh(self):
        """True when the corpus exceeds the bank (refresh draws new
        files) or clips are longer than the bank rows (refresh draws new
        crop windows)."""
        return len(self.paths) > self.max_clips or self._has_long_clips

    def bank(self, epoch=0):
        """The ``(N, L)`` device bank for this epoch (cached; reloaded on
        a new epoch only when a refresh would change the contents)."""
        if self._bank is not None and (
                epoch == self._epoch or not self.needs_refresh):
            return self._bank
        rng = np.random.RandomState((self.seed + 7919 * epoch) % (2 ** 31))
        if len(self.paths) > self.max_clips:
            idx = rng.choice(len(self.paths), self.max_clips, replace=False)
            paths = [self.paths[i] for i in sorted(idx)]
        else:
            paths = self.paths
        bank = np.zeros((len(paths), self.length), dtype=np.float32)
        self._has_long_clips = False
        for i, p in enumerate(paths):
            seg = AudioSegment.from_file(p)
            seg.resample(self.sample_rate)
            s = seg.samples
            if len(s) < self.length:
                if self.pad_mode == "tile":
                    s = np.tile(s, self.length // len(s) + 1)[:self.length]
                else:
                    s = np.pad(s, (0, self.length - len(s)))
            elif len(s) > self.length:
                # random crop window per refresh (the reference draws a
                # random segment per sample; across epochs this converges
                # to the same coverage)
                self._has_long_clips = True
                start = rng.randint(0, len(s) - self.length + 1)
                s = s[start:start + self.length]
            bank[i] = s[:self.length]
        self._bank = jnp.asarray(bank)
        self._epoch = epoch
        return self._bank

    _has_long_clips = True  # unknown before the first load: assume yes


def load_audio_bank(audio_dir, sample_rate, clip_seconds, max_clips=256,
                    pad_mode="tile"):
    """One-shot bank load (see :class:`AudioBank`). Returns None when the
    directory is missing/empty."""
    if audio_dir is None or not os.path.isdir(audio_dir):
        return None
    b = AudioBank(audio_dir, sample_rate, clip_seconds, max_clips, pad_mode)
    return b.bank(0) if b else None


# ----------------------------------------------------------------------
# device-side pure ops
# ----------------------------------------------------------------------
def rms_db(waves, axis=-1, valid_ratio=None):
    """RMS in dB; ``valid_ratio`` corrects for zero-padded tails so padded
    batches match the reference's per-sample (unpadded) RMS."""
    mean_sq = jnp.mean(waves ** 2, axis=axis)
    if valid_ratio is not None:
        mean_sq = mean_sq / jnp.maximum(valid_ratio, 1e-6)
    return 10.0 * jnp.log10(jnp.maximum(mean_sq, 1e-30))


def normalize_db(waves, target_db=-20.0, max_gain_db=300.0,
                 valid_ratio=None):
    """Batched RMS normalisation (yeaudio ``normalize`` equivalent used at
    reference ``reader.py:97-98``)."""
    gain = jnp.minimum(target_db - rms_db(waves, valid_ratio=valid_ratio),
                       max_gain_db)
    return waves * 10.0 ** (gain[..., None] / 20.0)


def apply_volume(waves, gain_db):
    """Per-sample gain in dB (yeaudio VolumePerturbAugmentor core)."""
    return waves * 10.0 ** (gain_db[..., None] / 20.0)


def mix_noise(waves, noise, snr_db, valid_ratio=None):
    """Mix pre-gathered noise clips at the requested per-sample SNR
    (yeaudio NoisePerturbAugmentor core): the noise is gained to
    ``wave_rms - snr`` before adding."""
    noise_gain = (rms_db(waves, valid_ratio=valid_ratio)
                  - rms_db(noise) - snr_db)
    return waves + noise * 10.0 ** (noise_gain[..., None] / 20.0)


def apply_reverb(waves, rir):
    """FFT convolution with per-sample room impulse responses, rescaled to
    the dry signal's peak (yeaudio ReverbPerturbAugmentor core).

    waves: (B, L); rir: (B, R). Output: (B, L).
    """
    l, r = waves.shape[-1], rir.shape[-1]
    n = l + r - 1
    nfft = 1 << (n - 1).bit_length()
    rir = rir / jnp.maximum(
        jnp.sqrt(jnp.sum(rir ** 2, axis=-1, keepdims=True)), 1e-8)
    out = jnp.fft.irfft(jnp.fft.rfft(waves, nfft) * jnp.fft.rfft(rir, nfft),
                        nfft)[..., :l]
    # keep the dry peak level
    peak_dry = jnp.max(jnp.abs(waves), axis=-1, keepdims=True)
    peak_wet = jnp.max(jnp.abs(out), axis=-1, keepdims=True)
    return out * peak_dry / jnp.maximum(peak_wet, 1e-8)


def time_warp(features, rng, max_time_warp=5):
    """SpecAugment time-warping: per-sample piecewise-linear warp of the
    time axis — a random source point in the middle of the utterance is
    pulled to a random target within ±max_time_warp frames, with linear
    interpolation (yeaudio SpecAugmentor's warp, default off in the
    reference config)."""
    b, t, f = features.shape
    w = int(max_time_warp)
    if w == 0 or t - 2 * w <= 0:
        return features
    k1, k2 = jax.random.split(rng)
    center = jax.random.randint(k1, (b,), w, t - w).astype(jnp.float32)
    dest = center + jax.random.randint(k2, (b,), -w, w + 1).astype(jnp.float32)
    pos = jnp.arange(t, dtype=jnp.float32)[None, :]           # output index
    c, d = center[:, None], dest[:, None]
    # map output position -> source position (two linear segments)
    left = pos * c / jnp.maximum(d, 1.0)
    right = c + (pos - d) * (t - 1 - c) / jnp.maximum(t - 1 - d, 1.0)
    src = jnp.where(pos <= d, left, right)
    src = jnp.clip(src, 0.0, t - 1.0)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t - 1)
    frac = (src - lo)[..., None]
    gather = jax.vmap(lambda feat, idx: feat[idx])
    return gather(features, lo) * (1 - frac) + gather(features, hi) * frac


def spec_augment(features, rng, freq_mask_ratio=0.1, n_freq_masks=1,
                 time_mask_ratio=0.05, n_time_masks=1, prob=0.5,
                 max_time_warp=0, valid_ratio=None):
    """Batched SpecAugment on (B, T, F): per-sample random time/freq zero
    masks (yeaudio SpecAugmentor core, applied at reference
    ``reader.py:105-107``) and optional time-warping. Mask widths are the
    reference's ``ratio * dim``; ``prob`` gates per sample."""
    b, t, f = features.shape
    f_width = max(int(f * freq_mask_ratio), 1)
    t_width = max(int(t * time_mask_ratio), 1)

    keys = jax.random.split(rng, 5)
    apply = jax.random.uniform(keys[0], (b, 1, 1)) < prob
    if max_time_warp:
        features = jnp.where(apply,
                             time_warp(features, keys[3], max_time_warp),
                             features)

    def _mask(key, dim, width, n_masks, axis_len_valid=None):
        # (B, n_masks) starts
        starts = jax.random.randint(key, (b, n_masks), 0,
                                    jnp.maximum(dim - width, 1))
        idx = jnp.arange(dim)[None, :, None]  # (1, dim, n_masks)
        hit = (idx >= starts[:, None, :]) & (idx < (starts + width)[:, None, :])
        return ~jnp.any(hit, axis=-1)  # (B, dim) True = keep

    keep_t = _mask(keys[1], t, t_width, n_time_masks)[:, :, None]
    keep_f = _mask(keys[2], f, f_width, n_freq_masks)[:, None, :]
    masked = features * keep_t * keep_f
    return jnp.where(apply, masked, features)


class DeviceAugmenter:
    """Bundles the device-side augmentation chain for the train step.

    Built from the reference augmentation YAML (``configs/augmentation.yml``
    keys: volume/noise/reverb/spec_aug); ``__call__(waves, rng)`` applies
    volume → noise → reverb in the reference's order (``reader.py:154-163``),
    and ``augment_features`` applies SpecAugment. Pure given the PRNG key —
    safe inside jit.
    """

    def __init__(self, aug_conf, sample_rate, clip_seconds, target_db=None):
        self.volume_conf = aug_conf.get("volume") if aug_conf else None
        self.noise_conf = aug_conf.get("noise") if aug_conf else None
        self.reverb_conf = aug_conf.get("reverb") if aug_conf else None
        self.spec_conf = aug_conf.get("spec_aug") if aug_conf else None
        self.target_db = target_db
        self._noise = self._rir = None
        if self.noise_conf and self.noise_conf.get("prob", 0) > 0:
            d = self.noise_conf.get("noise_dir")
            if d and os.path.isdir(d):
                self._noise = AudioBank(
                    d, sample_rate, clip_seconds,
                    max_clips=int(self.noise_conf.get("max_clips", 256)),
                    pad_mode="tile") or None
        if self.reverb_conf and self.reverb_conf.get("prob", 0) > 0:
            d = self.reverb_conf.get("reverb_dir")
            if d and os.path.isdir(d):
                # full-length RIRs (up to the training crop), zero-padded
                self._rir = AudioBank(
                    d, sample_rate,
                    float(self.reverb_conf.get("max_rir_seconds",
                                               clip_seconds)),
                    max_clips=int(self.reverb_conf.get("max_clips", 256)),
                    pad_mode="zero") or None

    # captured-constant banks (small corpora / inference-free tests)
    @property
    def noise_bank(self):
        return self._noise.bank() if self._noise else None

    @property
    def rir_bank(self):
        return self._rir.bank() if self._rir else None

    def device_banks(self, epoch=0):
        """Banks for this epoch as a pytree suitable for passing as jit
        *arguments* (same shapes every epoch → no recompiles), refreshed
        per epoch when the corpus exceeds the bank."""
        return {"noise": self._noise.bank(epoch) if self._noise else None,
                "rir": self._rir.bank(epoch) if self._rir else None}

    def __call__(self, waves, rng, valid_ratio=None, banks=None):
        if banks is None:
            banks = {"noise": self.noise_bank, "rir": self.rir_bank}
        b = waves.shape[0]
        keys = jax.random.split(rng, 8)
        if self.volume_conf and self.volume_conf.get("prob", 0) > 0:
            gain = jax.random.uniform(
                keys[0], (b,),
                minval=float(self.volume_conf.get("min_gain_dBFS", -15)),
                maxval=float(self.volume_conf.get("max_gain_dBFS", 15)))
            on = jax.random.uniform(keys[1], (b,)) < self.volume_conf["prob"]
            waves = jnp.where(on[:, None], apply_volume(waves, gain), waves)
        if banks.get("noise") is not None:
            bank = banks["noise"]
            idx = jax.random.randint(keys[2], (b,), 0, bank.shape[0])
            snr = jax.random.uniform(
                keys[3], (b,),
                minval=float(self.noise_conf.get("min_snr_dB", 10)),
                maxval=float(self.noise_conf.get("max_snr_dB", 50)))
            # per-sample random segment: circular offset into the clip
            # (the reference draws a random start per sample)
            shift = jax.random.randint(keys[7], (b,), 0, bank.shape[1])
            noise = jax.vmap(jnp.roll)(bank[idx], shift)[:, :waves.shape[1]]
            on = jax.random.uniform(keys[4], (b,)) < self.noise_conf["prob"]
            waves = jnp.where(on[:, None],
                              mix_noise(waves, noise, snr, valid_ratio),
                              waves)
        if banks.get("rir") is not None:
            bank = banks["rir"]
            idx = jax.random.randint(keys[5], (b,), 0, bank.shape[0])
            on = jax.random.uniform(keys[6], (b,)) < self.reverb_conf["prob"]
            waves = jnp.where(on[:, None],
                              apply_reverb(waves, bank[idx]), waves)
        if self.target_db is not None:
            # dB-normalisation after augmentation (reference reader.py:97-98)
            waves = normalize_db(waves, self.target_db,
                                 valid_ratio=valid_ratio)
        return waves

    def refresh(self, epoch):
        """Host-side per-epoch bank refresh; returns ``device_banks``."""
        return self.device_banks(epoch)

    def augment_features(self, features, rng):
        if not self.spec_conf or self.spec_conf.get("prob", 0) <= 0:
            return features
        return spec_augment(
            features, rng,
            freq_mask_ratio=float(self.spec_conf.get("freq_mask_ratio", 0.1)),
            n_freq_masks=int(self.spec_conf.get("n_freq_masks", 1)),
            time_mask_ratio=float(self.spec_conf.get("time_mask_ratio", 0.05)),
            n_time_masks=int(self.spec_conf.get("n_time_masks", 1)),
            max_time_warp=int(self.spec_conf.get("max_time_warp", 0)),
            prob=float(self.spec_conf.get("prob", 0.5)))
