"""Golden tests for the on-device feature front-end.

The fbank path is verified against an independent numpy implementation of
kaldi's pipeline written here with np.fft (the production path uses DFT
matmuls — different algorithm, same math), following kaldi
compute-fbank-feats / torchaudio.compliance.kaldi semantics.
"""

import numpy as np
import pytest

from voiceprintrecognition_paddlepaddle_tpu.ops import kaldi
from voiceprintrecognition_paddlepaddle_tpu.ops.features import (
    AudioFeaturizer, compute_feature, mel_spectrogram, mfcc, spectrogram)


def _numpy_kaldi_fbank(wave, sr=16000, n_mels=23):
    """Independent slow reference: FFT-based kaldi fbank, dither=0."""
    frame_len, shift, n_fft = int(sr * 0.025), int(sr * 0.010), 512
    t = 1 + (len(wave) - frame_len) // shift
    n = np.arange(frame_len)
    window = (0.5 - 0.5 * np.cos(2 * np.pi * n / (frame_len - 1))) ** 0.85
    # kaldi mel bank on n_fft/2 bins, mel(f) = 1127 ln(1 + f/700)
    mel = lambda f: 1127.0 * np.log(1.0 + f / 700.0)
    low, high = 20.0, sr / 2.0
    mel_pts = np.linspace(mel(low), mel(high), n_mels + 2)
    bin_freqs = mel(np.arange(n_fft // 2) * sr / n_fft)
    bank = np.zeros((n_mels, n_fft // 2 + 1))
    for m in range(n_mels):
        l, c, r = mel_pts[m], mel_pts[m + 1], mel_pts[m + 2]
        up = (bin_freqs - l) / (c - l)
        down = (r - bin_freqs) / (r - c)
        bank[m, :n_fft // 2] = np.maximum(0, np.minimum(up, down))
    out = np.zeros((t, n_mels))
    for i in range(t):
        frame = wave[i * shift:i * shift + frame_len].astype(np.float64)
        frame = frame - frame.mean()                        # remove_dc_offset
        frame = frame - 0.97 * np.concatenate([[frame[0]], frame[:-1]])
        frame = frame * window
        spec = np.abs(np.fft.rfft(frame, n_fft)) ** 2       # power
        out[i] = np.log(np.maximum(spec @ bank.T, np.finfo(np.float32).eps))
    return out.astype(np.float32)


@pytest.fixture(scope="module")
def wave():
    rng = np.random.RandomState(42)
    t = np.arange(16000 * 2) / 16000.0
    sig = (0.3 * np.sin(2 * np.pi * 220 * t)
           + 0.2 * np.sin(2 * np.pi * 1333 * t)
           + 0.05 * rng.randn(len(t)))
    return sig.astype(np.float32)


def test_fbank_matches_fft_reference(wave):
    got = np.asarray(kaldi.fbank(wave[None], sr=16000, n_mels=80))
    ref = _numpy_kaldi_fbank(wave, n_mels=80)
    assert got.shape == (1, ref.shape[0], 80)
    # fp32 matmul-DFT vs float64 FFT: compare in the power domain with a
    # relative tolerance plus a tiny absolute floor (near-eps bins suffer
    # inherent fp32 cancellation; they are ~120 dB below the speech bins)
    assert np.allclose(np.exp(got[0]), np.exp(ref), rtol=3e-2, atol=1e-5)
    # audible-energy bins must agree tightly in the log domain too
    mask = ref > -4.0
    assert mask.mean() > 0.5
    assert np.abs(got[0][mask] - ref[mask]).max() < 2e-2


def test_fbank_frame_count(wave):
    out = kaldi.fbank(wave[None], sr=16000, n_mels=80)
    expected = 1 + (len(wave) - 400) // 160
    assert out.shape == (1, expected, 80)
    # 3s @16k must give 298 frames (training crop shape)
    out3 = kaldi.fbank(np.zeros((1, 48000), np.float32), sr=16000, n_mels=80)
    assert out3.shape[1] == 298


def test_fbank_batch_consistency(wave):
    batch = np.stack([wave, wave * 0.5])
    out = np.asarray(kaldi.fbank(batch, sr=16000, n_mels=40))
    single = np.asarray(kaldi.fbank(wave[None], sr=16000, n_mels=40))
    assert np.allclose(out[0], single[0], atol=1e-5)


def test_spectrogram_matches_numpy_stft(wave):
    n_fft, hop = 512, 128
    got = np.asarray(spectrogram(wave[None], n_fft=n_fft, power=1.0))
    padded = np.pad(wave, n_fft // 2, mode="reflect")
    t = 1 + (len(padded) - n_fft) // hop
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    ref = np.stack([np.abs(np.fft.rfft(padded[i * hop:i * hop + n_fft] * win))
                    for i in range(t)])
    assert got.shape == (1, t, n_fft // 2 + 1)
    assert np.allclose(got[0], ref, atol=2e-3)


def test_mel_spectrogram_shape_and_nonneg(wave):
    out = np.asarray(mel_spectrogram(wave[None], sr=16000, n_mels=64))
    assert out.shape[0] == 1 and out.shape[2] == 64
    assert (out >= 0).all()


def test_mfcc_shape(wave):
    out = np.asarray(mfcc(wave[None], sr=16000, n_mfcc=40))
    assert out.shape[2] == 40


@pytest.mark.parametrize("method,dim", [
    ("Fbank", 80), ("MFCC", 40), ("MelSpectrogram", 64),
    ("LogMelSpectrogram", 128), ("Spectrogram", 257)])
def test_featurizer_methods(method, dim, wave):
    args = {"sr": 16000}
    if method == "Fbank":
        args["n_mels"] = 80
    feat = AudioFeaturizer(feature_method=method, method_args=args)
    assert feat.feature_dim == dim
    out = np.asarray(feat(wave))
    assert out.ndim == 3 and out.shape[0] == 1 and out.shape[2] == dim
    # CMN: mean over time ~ 0
    assert np.abs(out[0].mean(axis=0)).max() < 1e-3


def test_featurizer_masking(wave):
    feat = AudioFeaturizer("Fbank", {"sr": 16000, "n_mels": 80})
    full = np.asarray(feat(wave[None]))
    # pad the batch: second row only half-valid
    padded = np.stack([wave, np.concatenate([wave[:16000], np.zeros(16000, np.float32)])])
    ratios = np.array([1.0, 0.5], np.float32)
    out = np.asarray(feat(padded, ratios))
    t = out.shape[1]
    valid = int(0.5 * t)
    # padded tail zeroed
    assert np.abs(out[1, valid:]).max() == 0.0
    # masked CMN: valid-frame mean is zero
    assert np.abs(out[1, :valid].mean(axis=0)).max() < 1e-3
    # row 0 unaffected by masking of row 1
    assert np.allclose(out[0], full[0], atol=1e-4)


def test_fbank_scale_invariance_after_cmn(wave):
    """log-mel + CMN cancels input gain -> featurizer output gain-invariant."""
    feat = AudioFeaturizer("Fbank", {"sr": 16000, "n_mels": 80})
    a = np.asarray(feat(wave))
    b = np.asarray(feat(wave * 0.1))
    # exact invariance only holds for bins clear of the log-eps floor in
    # both versions; compare those (the overwhelming majority)
    raw_a = np.asarray(kaldi.fbank(wave[None], sr=16000, n_mels=80))
    raw_b = np.asarray(kaldi.fbank(wave[None] * 0.1, sr=16000, n_mels=80))
    floor = np.log(np.finfo(np.float32).eps) + 1.0
    mask = (raw_a > floor) & (raw_b > floor)
    assert mask.mean() > 0.9
    assert np.abs((a - b)[mask]).max() < 5e-2
