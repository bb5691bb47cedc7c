"""Secondary feature-method details: MFCC = DCT-II(ortho) of log-mel dB,
power relations, top_db clamping, num_frames consistency."""

import numpy as np
import pytest
from scipy.fft import dct as scipy_dct

from voiceprintrecognition_paddlepaddle_tpu.ops.features import (
    AudioFeaturizer, log_mel_spectrogram, mel_spectrogram, mfcc, spectrogram)


@pytest.fixture(scope="module")
def wave():
    rng = np.random.RandomState(7)
    t = np.arange(16000) / 16000.0
    return (0.4 * np.sin(2 * np.pi * 500 * t)
            + 0.1 * rng.randn(16000)).astype(np.float32)


def test_mfcc_is_dct_of_logmel(wave):
    logmel = np.asarray(log_mel_spectrogram(wave[None], sr=16000, n_mels=64))
    got = np.asarray(mfcc(wave[None], sr=16000, n_mfcc=20, n_mels=64))
    ref = scipy_dct(logmel[0], type=2, axis=-1, norm="ortho")[:, :20]
    assert np.allclose(got[0], ref, atol=1e-3)


def test_spectrogram_power_relation(wave):
    p1 = np.asarray(spectrogram(wave[None], power=1.0))
    p2 = np.asarray(spectrogram(wave[None], power=2.0))
    assert np.allclose(p1 ** 2, p2, rtol=1e-3, atol=1e-4)


def test_logmel_top_db_clamp(wave):
    full = np.asarray(log_mel_spectrogram(wave[None], sr=16000, top_db=None))
    clamped = np.asarray(log_mel_spectrogram(wave[None], sr=16000,
                                             top_db=30.0))
    assert clamped.min() >= clamped.max() - 30.0 - 1e-4
    assert np.allclose(clamped.max(), full.max(), atol=1e-4)


def test_mel_filterbank_rows_cover_band():
    m = np.asarray(mel_spectrogram(
        np.random.RandomState(0).randn(1, 16000).astype(np.float32) * 0.1,
        sr=16000, n_mels=64))
    # every mel bin picks up energy from broadband noise
    assert (m[0].sum(axis=0) > 0).all()


@pytest.mark.parametrize("method,args", [
    ("Fbank", {"sr": 16000, "n_mels": 40}),
    ("MelSpectrogram", {"sr": 16000, "n_mels": 64}),
    ("Spectrogram", {"sr": 16000}),
    ("MFCC", {"sr": 16000}),
    ("LogMelSpectrogram", {"sr": 16000}),
])
def test_num_frames_matches_output(method, args, wave):
    feat = AudioFeaturizer(method, args)
    out = feat(wave[None])
    assert out.shape[1] == feat.num_frames(len(wave))


def test_fbank_custom_frame_args_num_frames():
    feat = AudioFeaturizer("Fbank", {"sr": 16000, "n_mels": 40,
                                     "frame_length": 32.0,
                                     "frame_shift": 16.0})
    wave = np.zeros(16000, np.float32)
    out = feat(wave[None])
    expected = 1 + (16000 - 512) // 256
    assert out.shape[1] == expected == feat.num_frames(16000)


def test_pk_sampler_deterministic_per_epoch():
    from voiceprintrecognition_paddlepaddle_tpu.data_utils.pk_sampler import (
        PKSampler)

    class DS:
        labels = [i % 4 for i in range(32)]

    s1 = PKSampler(DS(), batch_size=8, sample_per_id=2)
    s2 = PKSampler(DS(), batch_size=8, sample_per_id=2)
    e1a = list(s1)
    e2a = list(s2)
    assert e1a == e2a          # same epoch, same seed -> identical
    e1b = list(s1)             # epoch advanced inside the sampler
    assert e1a != e1b          # epochs differ


def test_fbank_dither_reachable_through_featurizer(wave):
    """Configs setting ``method_args.dither`` must work end-to-end
    (the reference passes dither via method_args, featurizer.py:83-101)."""
    import jax

    base = AudioFeaturizer("Fbank", {"sr": 16000, "n_mels": 40})
    feat = AudioFeaturizer("Fbank", {"sr": 16000, "n_mels": 40,
                                     "dither": 0.1})
    assert feat.dither == 0.1
    clean = np.asarray(base(wave[None]))
    noisy = np.asarray(feat(wave[None]))  # auto-keyed: must not crash
    assert noisy.shape == clean.shape
    assert not np.allclose(noisy, clean, atol=1e-6)  # dither did something
    assert np.isfinite(noisy).all()

    # explicit key -> deterministic
    k = jax.random.PRNGKey(3)
    a = np.asarray(feat(wave[None], rng=k))
    b = np.asarray(feat(wave[None], rng=k))
    assert np.array_equal(a, b)
