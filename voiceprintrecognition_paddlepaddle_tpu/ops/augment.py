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

__all__ = ["SpeedPerturbAugmentor", "DeviceAugmenter", "load_audio_bank",
           "spec_augment", "mix_noise", "apply_reverb", "normalize_db",
           "rms_db"]


# ----------------------------------------------------------------------
# host-side: speed perturbation (changes length)
# ----------------------------------------------------------------------
class SpeedPerturbAugmentor:
    """Random speed in {0.9, 1.0, 1.1} via linear-interp resampling.

    yeaudio-equivalent used at reference ``reader.py:141-151``; with
    ``speed_perturb_3_class`` the label becomes ``spk_id * 3 + idx`` and the
    classifier grows 3x (reference ``trainer.py:169-173``).
    """

    SPEEDS = (1.0, 0.9, 1.1)

    def __init__(self, prob=1.0, speed_perturb_3_class=False,
                 num_speakers=None, **kwargs):
        self.prob = prob
        self.speed_perturb_3_class = speed_perturb_3_class
        self.num_speakers = num_speakers

    def __call__(self, samples, spk_id, rng: random.Random = random):
        if rng.random() >= self.prob:
            return samples, spk_id
        idx = rng.randint(0, 2)
        speed = self.SPEEDS[idx]
        if speed != 1.0:
            old_len = len(samples)
            new_len = int(old_len / speed)
            old_idx = np.linspace(0, old_len - 1, new_len)
            samples = np.interp(old_idx, np.arange(old_len),
                                samples).astype(np.float32)
        if self.speed_perturb_3_class:
            spk_id = spk_id * 3 + idx
        return samples, spk_id


def load_audio_bank(audio_dir, sample_rate, clip_seconds, max_clips=256):
    """Load a directory of wavs into a fixed-shape ``(N, L)`` bank for
    on-device noise/reverb augmentation. Short clips tile-repeat, long
    clips crop. Returns None when the directory is missing/empty."""
    if audio_dir is None or not os.path.isdir(audio_dir):
        return None
    paths = sorted(
        os.path.join(audio_dir, f) for f in os.listdir(audio_dir)
        if f.lower().endswith((".wav", ".flac")))[:max_clips]
    if not paths:
        return None
    length = int(clip_seconds * sample_rate)
    bank = np.zeros((len(paths), length), dtype=np.float32)
    for i, p in enumerate(paths):
        seg = AudioSegment.from_file(p)
        seg.resample(sample_rate)
        s = seg.samples
        if len(s) < length:
            s = np.tile(s, length // len(s) + 1)
        bank[i] = s[:length]
    return jnp.asarray(bank)


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
        self.noise_bank = None
        self.rir_bank = None
        if self.noise_conf and self.noise_conf.get("prob", 0) > 0:
            self.noise_bank = load_audio_bank(
                self.noise_conf.get("noise_dir"), sample_rate, clip_seconds)
        if self.reverb_conf and self.reverb_conf.get("prob", 0) > 0:
            self.rir_bank = load_audio_bank(
                self.reverb_conf.get("reverb_dir"), sample_rate, 0.5)

    def __call__(self, waves, rng, valid_ratio=None):
        b = waves.shape[0]
        keys = jax.random.split(rng, 8)
        if self.volume_conf and self.volume_conf.get("prob", 0) > 0:
            gain = jax.random.uniform(
                keys[0], (b,),
                minval=float(self.volume_conf.get("min_gain_dBFS", -15)),
                maxval=float(self.volume_conf.get("max_gain_dBFS", 15)))
            on = jax.random.uniform(keys[1], (b,)) < self.volume_conf["prob"]
            waves = jnp.where(on[:, None], apply_volume(waves, gain), waves)
        if self.noise_bank is not None:
            idx = jax.random.randint(keys[2], (b,), 0, self.noise_bank.shape[0])
            snr = jax.random.uniform(
                keys[3], (b,),
                minval=float(self.noise_conf.get("min_snr_dB", 10)),
                maxval=float(self.noise_conf.get("max_snr_dB", 50)))
            noise = self.noise_bank[idx][:, :waves.shape[1]]
            on = jax.random.uniform(keys[4], (b,)) < self.noise_conf["prob"]
            waves = jnp.where(on[:, None],
                              mix_noise(waves, noise, snr, valid_ratio),
                              waves)
        if self.rir_bank is not None:
            idx = jax.random.randint(keys[5], (b,), 0, self.rir_bank.shape[0])
            on = jax.random.uniform(keys[6], (b,)) < self.reverb_conf["prob"]
            waves = jnp.where(on[:, None],
                              apply_reverb(waves, self.rir_bank[idx]), waves)
        if self.target_db is not None:
            # dB-normalisation after augmentation (reference reader.py:97-98)
            waves = normalize_db(waves, self.target_db,
                                 valid_ratio=valid_ratio)
        return waves

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
