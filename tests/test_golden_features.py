"""External golden vectors for the feature front-end.

``tests/golden/golden_features.npz`` was produced by
``tests/golden/generate_golden.py`` — an independent torch implementation of
the published algorithms the reference relies on
(``torchaudio.compliance.kaldi.fbank`` == ``paddleaudio.compliance.kaldi``,
reference ``ppvector/data_utils/featurizer.py:83-101``; and
``paddle.audio.features`` librosa-convention STFT/mel). Different framework,
different FFT (torch.fft vs DFT matmul), different window constructor
(``torch.hann_window`` vs hand-rolled cosines), float64 accumulation — so a
shared misreading between production code and its test is far less likely
than with the in-repo numpy cross-check (``tests/test_features.py``).

Also locks the hand-derivable kaldi gotchas individually: window
denominator, snip-edges frame count, mel-bank geometry + Nyquist column,
log floor constant.
"""

import math
import os

import numpy as np
import pytest

from voiceprintrecognition_paddlepaddle_tpu.ops import kaldi
from voiceprintrecognition_paddlepaddle_tpu.ops.features import (
    AudioFeaturizer, _slaney_mel_banks_np, mel_spectrogram, mfcc,
    log_mel_spectrogram, spectrogram)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "golden_features.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


def _log_compare(got, ref, power_rtol=3e-2, log_atol=2e-2, active=-4.0):
    """fp32 matmul-DFT vs float64 FFT: power-domain relative tolerance
    everywhere + tight log-domain agreement on audible-energy bins."""
    assert got.shape == ref.shape
    assert np.allclose(np.exp(got), np.exp(ref), rtol=power_rtol, atol=1e-5)
    mask = ref > active
    assert mask.mean() > 0.5
    assert np.abs(got - ref)[mask].max() < log_atol


# ---------------------------------------------------------------------------
# kaldi fbank vs torch golden
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("key,n_mels,kwargs", [
    ("fbank_80", 80, {}),
    ("fbank_23", 23, {}),
    ("fbank_40_nopre", 40, dict(preemphasis_coefficient=0.0,
                                remove_dc_offset=False)),
    ("fbank_40_linear", 40, dict(use_power=False)),
    ("fbank_40_nosnip", 40, dict(snip_edges=False)),
    ("fbank_40_energy", 40, dict(use_energy=True)),
    ("fbank_40_energy_win", 40, dict(use_energy=True, raw_energy=False,
                                     energy_floor=0.0)),
    ("fbank_40_energy_htk", 40, dict(use_energy=True, htk_compat=True)),
    ("fbank_40_vtln_0p9", 40, dict(vtln_warp=0.9)),
    ("fbank_40_vtln_1p1", 40, dict(vtln_warp=1.1)),
])
def test_fbank_matches_torch_golden(golden, key, n_mels, kwargs):
    wave = golden["wave"]
    got = np.asarray(kaldi.fbank(wave[None], sr=16000, n_mels=n_mels,
                                 **kwargs))[0]
    _log_compare(got, golden[key])


def test_vtln_mel_bank_matches_torch_golden(golden):
    got = kaldi._kaldi_mel_banks_np(40, 512, 16000, vtln_warp=0.9)
    ref = golden["kaldi_bank_40_512_vtln_0p9"].T
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 1e-5


def test_featurizer_option_surface_consistency(golden):
    """A ported reference config using the method_args passthrough options
    (snip_edges=False, use_energy) must run with self-consistent
    feature_dim / num_frames (reference featurizer.py:83-101)."""
    wave = golden["wave"]
    feat = AudioFeaturizer("Fbank", {"sr": 16000, "n_mels": 40,
                                     "snip_edges": False,
                                     "use_energy": True})
    got = np.asarray(feat(wave[None]))[0]
    assert got.shape == (feat.num_frames(len(wave)), feat.feature_dim)
    assert got.shape == (100, 41)


def test_featurizer_fbank_is_golden_plus_cmn(golden):
    wave = golden["wave"]
    feat = AudioFeaturizer("Fbank", {"sr": 16000, "n_mels": 80})
    got = np.asarray(feat(wave[None]))[0]
    ref = golden["fbank_80"]
    ref = ref - ref.mean(axis=0, keepdims=True)
    mask = golden["fbank_80"] > -4.0
    assert np.abs(got - ref)[mask].max() < 2e-2


# ---------------------------------------------------------------------------
# paddle.audio-style methods vs torch golden
# ---------------------------------------------------------------------------
def test_spectrogram_matches_torch_golden(golden):
    got = np.asarray(spectrogram(golden["wave"][None], n_fft=512,
                                 power=1.0))[0]
    ref = golden["spectrogram_mag"]
    assert got.shape == ref.shape
    assert np.allclose(got, ref, atol=2e-3)


def test_mel_spectrogram_matches_torch_golden(golden):
    got = np.asarray(mel_spectrogram(golden["wave"][None], sr=16000,
                                     n_mels=64))[0]
    ref = golden["mel_64"]
    assert got.shape == ref.shape
    assert np.allclose(got, ref, rtol=2e-3, atol=1e-6)


def test_log_mel_matches_torch_golden(golden):
    got = np.asarray(log_mel_spectrogram(golden["wave"][None], sr=16000,
                                         n_mels=128))[0]
    ref = golden["logmel_128"]
    assert got.shape == ref.shape
    # dB domain: 0.05 dB on bins clear of the amin floor
    mask = ref > -95.0
    assert mask.mean() > 0.5
    assert np.abs(got - ref)[mask].max() < 5e-2


def test_mfcc_matches_torch_golden(golden):
    got = np.asarray(mfcc(golden["wave"][None], sr=16000, n_mfcc=40))[0]
    ref = golden["mfcc_40"]
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 1e-1  # DCT of dB values (range ~±300)


# ---------------------------------------------------------------------------
# micro-asserts: each known gotcha, hand-derivable
# ---------------------------------------------------------------------------
def test_povey_window_denominator():
    """kaldi feature-window.cc uses a = 2π/(N−1) (torch.hann_window
    periodic=False); a periodic window (denominator N) would differ in the
    3rd decimal at k=1."""
    w = kaldi._window_np("povey", 400)
    expected = (0.5 - 0.5 * math.cos(2 * math.pi * 1 / 399)) ** 0.85
    assert abs(float(w[1]) - expected) < 1e-7
    wrong = (0.5 - 0.5 * math.cos(2 * math.pi * 1 / 400)) ** 0.85
    assert abs(float(w[1]) - wrong) > 1e-9


def test_snip_edges_frame_count():
    """m = 1 + (n − window) // shift, 0 when n < window."""
    f = kaldi.num_frames_snip_edges
    assert f(16000, 400, 160) == 98
    assert f(399, 400, 160) == 0
    assert f(400, 400, 160) == 1
    assert f(559, 400, 160) == 1
    assert f(560, 400, 160) == 2
    assert f(48000, 400, 160) == 298  # the 3 s training crop


def test_kaldi_mel_bank_matches_torch_golden(golden):
    bank = kaldi._kaldi_mel_banks_np(80, 512, 16000)  # (257, 80)
    ref = golden["kaldi_bank_80_512"].T
    assert bank.shape == ref.shape
    assert np.abs(bank - ref).max() < 1e-6
    # Nyquist bin carries zero weight in every filter (kaldi banks span
    # n_fft/2 bins; torchaudio pads the last column with zeros)
    assert np.abs(bank[-1]).max() == 0.0


def test_slaney_mel_bank_matches_torch_golden(golden):
    bank = _slaney_mel_banks_np(16000, 512, 64, 50.0, None, False, "slaney")
    ref = golden["slaney_bank_64_512"].T
    assert bank.shape == ref.shape
    assert np.abs(bank - ref).max() < 1e-6


def test_log_floor_is_float32_eps():
    """kaldi/torchaudio floor mel energies at float32 eps before log."""
    assert kaldi._LOG_EPS == np.finfo(np.float32).eps
    silent = np.zeros((1, 16000), np.float32)
    out = np.asarray(kaldi.fbank(silent, sr=16000, n_mels=23))
    assert np.allclose(out, np.log(np.finfo(np.float32).eps))


def test_preemphasis_and_dc_stages_are_live(golden):
    """The preemph/DC stages must actually run: disabling them must move
    the output away from the default-path golden."""
    wave = golden["wave"]
    off = np.asarray(kaldi.fbank(wave[None], sr=16000, n_mels=80,
                                 preemphasis_coefficient=0.0,
                                 remove_dc_offset=False))[0]
    assert not np.allclose(off, golden["fbank_80"], atol=1e-3)
