"""On-device augmentation ops + host speed perturb."""

import random

import jax
import numpy as np
import pytest

from voiceprintrecognition_paddlepaddle_tpu.ops.augment import (
    DeviceAugmenter, SpeedPerturbAugmentor, apply_reverb, mix_noise,
    normalize_db, rms_db, spec_augment)


def test_normalize_db_hits_target():
    rng = np.random.RandomState(0)
    waves = (rng.randn(4, 16000) * np.array([[0.001], [0.01], [0.1], [1.0]])
             ).astype(np.float32)
    out = np.asarray(normalize_db(waves, target_db=-20.0))
    got = 10 * np.log10((out ** 2).mean(axis=1))
    assert np.allclose(got, -20.0, atol=0.1)


def test_normalize_db_valid_ratio_correction():
    rng = np.random.RandomState(0)
    full = rng.randn(16000).astype(np.float32) * 0.1
    padded = np.concatenate([full[:8000], np.zeros(8000, np.float32)])
    out = np.asarray(normalize_db(padded[None], target_db=-20.0,
                                  valid_ratio=np.array([0.5])))[0]
    # RMS of the VALID half must hit the target
    got = 10 * np.log10((out[:8000] ** 2).mean())
    assert abs(got - (-20.0)) < 0.1


def test_mix_noise_snr():
    rng = np.random.RandomState(1)
    sig = rng.randn(1, 32000).astype(np.float32) * 0.1
    noise = rng.randn(1, 32000).astype(np.float32) * 0.5
    out = np.asarray(mix_noise(sig, noise, np.array([20.0], np.float32)))
    added = out - sig
    snr = (rms_db(sig) - 10 * np.log10((added ** 2).mean(axis=1)))
    assert abs(float(snr[0]) - 20.0) < 0.5


def test_reverb_preserves_peak_and_length():
    rng = np.random.RandomState(2)
    sig = rng.randn(2, 16000).astype(np.float32) * 0.3
    rir = np.zeros((2, 4000), np.float32)
    rir[:, 0] = 1.0
    rir[:, 2000] = 0.5  # echo
    out = np.asarray(apply_reverb(sig, rir))
    assert out.shape == sig.shape
    assert np.allclose(np.abs(out).max(axis=1), np.abs(sig).max(axis=1),
                       rtol=1e-4)


def test_reverb_identity_rir():
    rng = np.random.RandomState(3)
    sig = rng.randn(1, 8000).astype(np.float32)
    rir = np.zeros((1, 100), np.float32)
    rir[:, 0] = 1.0
    out = np.asarray(apply_reverb(sig, rir))
    assert np.allclose(out, sig, atol=1e-3)


def test_spec_augment_masks():
    rng = jax.random.PRNGKey(0)
    feats = np.ones((8, 100, 80), np.float32)
    out = np.asarray(spec_augment(feats, rng, prob=1.0,
                                  freq_mask_ratio=0.1, time_mask_ratio=0.05))
    assert out.shape == feats.shape
    # every sample has zeroed rows and columns of the right widths
    for b in range(8):
        zero_t = (out[b] == 0).all(axis=1).sum()
        zero_f = (out[b] == 0).all(axis=0).sum()
        assert zero_t >= 5   # time mask width = 5
        assert zero_f >= 8   # freq mask width = 8
    # prob=0 -> untouched
    out0 = np.asarray(spec_augment(feats, rng, prob=0.0))
    assert (out0 == feats).all()


def test_time_warp_preserves_shape_and_endpoints():
    from voiceprintrecognition_paddlepaddle_tpu.ops.augment import time_warp
    rng = jax.random.PRNGKey(0)
    feats = np.tile(np.arange(100, dtype=np.float32)[None, :, None],
                    (4, 1, 8))
    out = np.asarray(time_warp(feats, rng, max_time_warp=5))
    assert out.shape == feats.shape
    # endpoints anchored, interior monotone nondecreasing along time
    assert np.allclose(out[:, 0, 0], 0.0, atol=1e-4)
    assert np.allclose(out[:, -1, 0], 99.0, atol=1e-4)
    assert (np.diff(out[:, :, 0], axis=1) >= -1e-4).all()
    # warping actually moved something
    assert np.abs(out - feats).max() > 0.5
    # warp=0 is identity
    same = np.asarray(time_warp(feats, rng, max_time_warp=0))
    assert (same == feats).all()


def test_spec_augment_with_warp():
    rng = jax.random.PRNGKey(1)
    feats = np.random.RandomState(0).randn(4, 100, 16).astype(np.float32)
    out = np.asarray(spec_augment(feats, rng, prob=1.0, max_time_warp=5))
    assert out.shape == feats.shape


def test_speed_perturb_changes_length_and_label():
    aug = SpeedPerturbAugmentor(prob=1.0, speed_perturb_3_class=True,
                                num_speakers=10)
    samples = np.sin(np.linspace(0, 100, 16000)).astype(np.float32)
    seen_labels = set()
    seen_lens = set()
    rng = random.Random(0)
    for _ in range(30):
        out, spk = aug(samples, 3, rng)
        seen_labels.add(spk)
        seen_lens.add(len(out))
    assert seen_labels <= {9, 10, 11}
    assert len(seen_labels) == 3
    assert len(seen_lens) == 3  # 16000, ~17778, ~14545


def test_speed_perturb_is_antialiased():
    """A 6 kHz tone stretched to 1.1x must come out as a clean ~6.6 kHz
    tone: polyphase resampling keeps out-of-band energy tiny where the
    old linear interp aliased the top octave."""
    sr = 16000
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * 6000.0 * t).astype(np.float32)
    out = SpeedPerturbAugmentor.resample(tone, 1.1)
    assert len(out) == int(sr / 1.1)
    # the stretched samples are played back at the original rate, so the
    # tone lands at 6000 * 1.1 = 6600 Hz
    spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
    freqs = np.fft.rfftfreq(len(out), d=1.0 / sr)
    peak = freqs[np.argmin(np.abs(freqs - 6600.0))]
    inband = np.abs(freqs - peak) < 100.0
    # ignore DC/edge leakage below 100 Hz
    band_ratio = (spec[~inband & (freqs > 100)] ** 2).sum() \
        / (spec[inband] ** 2).sum()
    assert band_ratio < 1e-3, f"aliased energy ratio {band_ratio:.2e}"
    # and the perceived pitch is 1.1x
    assert abs(freqs[np.argmax(spec)] - 6600.0) < 50.0


def test_audio_bank_refresh_and_pad_modes(tmp_path):
    from voiceprintrecognition_paddlepaddle_tpu.ops.audio import AudioSegment
    from voiceprintrecognition_paddlepaddle_tpu.ops.augment import AudioBank
    rng = np.random.RandomState(0)
    d = tmp_path / "noise"
    d.mkdir()
    for i in range(6):  # long clips: 2 s each, bank rows are 1 s
        AudioSegment(rng.randn(32000).astype(np.float32) * 0.1,
                     16000).to_wav_file(str(d / f"n{i}.wav"))
    bank = AudioBank(str(d), 16000, 1.0, max_clips=3)
    b0 = np.asarray(bank.bank(0))
    b1 = np.asarray(bank.bank(1))
    assert b0.shape == (3, 16000) and b1.shape == (3, 16000)
    # refresh rotated files and/or crop windows
    assert not np.allclose(b0, b1)
    # caching: same epoch returns the same array
    assert bank.bank(1) is bank.bank(1)

    # zero pad mode must not tile (RIR semantics)
    r = tmp_path / "rir"
    r.mkdir()
    impulse = np.zeros(4000, np.float32)
    impulse[0] = 1.0
    AudioSegment(impulse, 16000).to_wav_file(str(r / "r0.wav"))
    rb = np.asarray(AudioBank(str(r), 16000, 1.0, pad_mode="zero").bank())
    assert rb.shape == (1, 16000)
    assert np.abs(rb[0, 8000:]).max() == 0.0  # zero tail, no tiled echo


def test_noise_mix_random_segment_coverage(tmp_path):
    """Per-sample random offsets: with a single noise clip whose energy
    is a one-hot burst, the burst must land at different positions across
    the batch (the reference draws a random segment per sample), while
    the achieved SNR stays near the request."""
    from voiceprintrecognition_paddlepaddle_tpu.ops.audio import AudioSegment
    d = tmp_path / "noise"
    d.mkdir()
    clip = np.zeros(16000, np.float32)
    clip[:800] = np.random.RandomState(0).randn(800) * 0.5  # leading burst
    AudioSegment(clip, 16000).to_wav_file(str(d / "n0.wav"))
    aug_conf = {"noise": {"prob": 1.0, "noise_dir": str(d),
                          "min_snr_dB": 15, "max_snr_dB": 15}}
    aug = DeviceAugmenter(aug_conf, sample_rate=16000, clip_seconds=1)
    rng = np.random.RandomState(1)
    waves = rng.randn(16, 16000).astype(np.float32) * 0.1
    out = np.asarray(aug(waves, jax.random.PRNGKey(0)))
    added = out - waves
    # burst positions differ across the batch
    positions = np.argmax(np.abs(added) > 1e-4, axis=1)
    assert len(np.unique(positions)) >= 8, positions
    # achieved SNR ~= 15 dB per sample
    snr = 10 * np.log10((waves ** 2).mean(axis=1)
                        / (added ** 2).mean(axis=1))
    assert np.allclose(snr, 15.0, atol=1.0), snr


def test_device_augmenter_banks_as_jit_args(tmp_path):
    """Banks passed as traced args (the per-epoch refresh path) give the
    same result as the captured-constant path."""
    from voiceprintrecognition_paddlepaddle_tpu.ops.audio import AudioSegment
    d = tmp_path / "noise"
    d.mkdir()
    AudioSegment(np.random.RandomState(0).randn(16000).astype(np.float32)
                 * 0.1, 16000).to_wav_file(str(d / "n0.wav"))
    aug_conf = {"noise": {"prob": 1.0, "noise_dir": str(d),
                          "min_snr_dB": 10, "max_snr_dB": 20}}
    aug = DeviceAugmenter(aug_conf, sample_rate=16000, clip_seconds=1)
    waves = np.random.RandomState(1).randn(4, 16000).astype(np.float32) * 0.1
    key = jax.random.PRNGKey(0)
    ref = np.asarray(aug(waves, key))
    got = np.asarray(jax.jit(
        lambda w, k, banks: aug(w, k, banks=banks))(
            waves, key, aug.device_banks(0)))
    assert np.allclose(ref, got, atol=1e-6)


def test_device_augmenter_passthrough_and_banks(tmp_path):
    # build a noise bank dir with one clip
    from voiceprintrecognition_paddlepaddle_tpu.ops.audio import AudioSegment
    noise = np.random.RandomState(0).randn(16000).astype(np.float32) * 0.1
    (tmp_path / "noise").mkdir()
    AudioSegment(noise, 16000).to_wav_file(str(tmp_path / "noise" / "n0.wav"))
    aug_conf = {
        "volume": {"prob": 1.0, "min_gain_dBFS": -6, "max_gain_dBFS": 6},
        "noise": {"prob": 1.0, "noise_dir": str(tmp_path / "noise"),
                  "min_snr_dB": 10, "max_snr_dB": 20},
        "reverb": None,
        "spec_aug": {"prob": 1.0},
    }
    aug = DeviceAugmenter(aug_conf, sample_rate=16000, clip_seconds=1,
                          target_db=-20)
    assert aug.noise_bank is not None and aug.noise_bank.shape == (1, 16000)
    waves = np.random.RandomState(1).randn(4, 16000).astype(np.float32) * 0.05
    out = np.asarray(aug(waves, jax.random.PRNGKey(0)))
    assert out.shape == waves.shape
    # dB-normalised at the end
    assert np.allclose(10 * np.log10((out ** 2).mean(axis=1)), -20, atol=0.2)
    feats = np.random.RandomState(2).randn(4, 100, 80).astype(np.float32)
    fa = np.asarray(aug.augment_features(feats, jax.random.PRNGKey(1)))
    assert fa.shape == feats.shape
    assert (fa == 0).any()
