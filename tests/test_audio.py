import io

import numpy as np
import pytest

from voiceprintrecognition_paddlepaddle_tpu.ops.audio import AudioSegment

REF_WAV = "/root/reference/dataset/a_1.wav"


def test_from_file_reference_asset():
    seg = AudioSegment.from_file(REF_WAV)
    assert seg.sample_rate == 16000
    assert seg.num_samples == 58752
    assert abs(seg.duration - 58752 / 16000) < 1e-6
    assert seg.samples.dtype == np.float32
    assert np.abs(seg.samples).max() <= 1.0


def test_bytes_roundtrip(tmp_path):
    seg = AudioSegment.from_file(REF_WAV)
    out = tmp_path / "x.wav"
    seg.to_wav_file(out)
    seg2 = AudioSegment.from_file(str(out))
    assert seg2.sample_rate == seg.sample_rate
    assert seg2.num_samples == seg.num_samples
    assert np.allclose(seg.samples, seg2.samples, atol=1e-3)
    with open(out, "rb") as f:
        seg3 = AudioSegment.from_bytes(f.read())
    assert seg3.num_samples == seg.num_samples


def test_from_ndarray_int16():
    x = (np.sin(np.linspace(0, 100, 16000)) * 20000).astype(np.int16)
    seg = AudioSegment.from_ndarray(x, 16000)
    assert seg.samples.dtype == np.float32
    assert np.abs(seg.samples).max() < 1.0


def test_resample():
    t = np.linspace(0, 1, 16000, endpoint=False)
    seg = AudioSegment(np.sin(2 * np.pi * 100 * t).astype(np.float32), 16000)
    seg.resample(8000)
    assert seg.sample_rate == 8000
    assert abs(seg.num_samples - 8000) <= 1
    # 100 Hz tone survives downsampling
    spec = np.abs(np.fft.rfft(seg.samples))
    assert np.argmax(spec) == 100


def test_normalize_targets_rms():
    rng = np.random.RandomState(0)
    seg = AudioSegment(rng.randn(16000).astype(np.float32) * 0.01, 16000)
    seg.normalize(target_db=-20)
    assert abs(seg.rms_db() - (-20)) < 0.1


def test_crop_modes():
    seg = AudioSegment(np.arange(32000, dtype=np.float32), 16000)
    seg.crop(1.0, mode="eval")
    assert seg.num_samples == 16000
    assert seg.samples[0] == 0.0  # leading window in eval mode


def test_vad_finds_speech_islands():
    sr = 16000
    rng = np.random.RandomState(0)
    noise = rng.randn(sr * 6).astype(np.float32) * 0.001
    sig = noise.copy()
    # two loud bursts: 1-2 s and 4-5 s
    for a, b in [(1, 2), (4, 5)]:
        t = np.arange((b - a) * sr) / sr
        sig[a * sr:b * sr] += np.sin(2 * np.pi * 300 * t).astype(np.float32) * 0.5
    seg = AudioSegment(sig, sr)
    out = seg.vad(return_seconds=True)
    assert len(out) == 2
    assert abs(out[0]["start"] - 1.0) < 0.2 and abs(out[0]["end"] - 2.0) < 0.2
    assert abs(out[1]["start"] - 4.0) < 0.2 and abs(out[1]["end"] - 5.0) < 0.2


def test_vad_silence_returns_empty():
    seg = AudioSegment(np.zeros(16000, dtype=np.float32), 16000)
    assert seg.vad() == []
