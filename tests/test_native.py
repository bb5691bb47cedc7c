"""C++ audio I/O library vs the pure-Python reference paths."""

import numpy as np
import pytest
from scipy.signal import resample_poly

from voiceprintrecognition_paddlepaddle_tpu.native import (
    decode_wav_native, native_available, resample_native, rms_db_native)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native lib unavailable (no g++?)")

REF_WAV = "/root/reference/dataset/a_1.wav"


def test_decode_matches_python():
    import wave
    with open(REF_WAV, "rb") as f:
        data = f.read()
    samples, sr = decode_wav_native(data)
    assert sr == 16000
    with wave.open(REF_WAV) as w:
        raw = np.frombuffer(w.readframes(w.getnframes()), "<i2")
    expected = raw.astype(np.float32) / 32768.0
    assert samples.shape == expected.shape
    assert np.abs(samples - expected).max() < 1e-6


def test_decode_float32_wav(tmp_path):
    import struct
    sr, n = 8000, 1000
    payload = np.linspace(-0.5, 0.5, n).astype("<f4").tobytes()
    header = (b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
              + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, sr, sr * 4, 4, 32)
              + b"data" + struct.pack("<I", len(payload)))
    samples, got_sr = decode_wav_native(header + payload)
    assert got_sr == sr
    assert np.allclose(samples, np.linspace(-0.5, 0.5, n), atol=1e-6)


def test_decode_stereo_mixdown(tmp_path):
    import wave
    p = tmp_path / "st.wav"
    left = (np.ones(100) * 10000).astype("<i2")
    right = (np.ones(100) * -10000).astype("<i2")
    inter = np.empty(200, "<i2")
    inter[0::2], inter[1::2] = left, right
    with wave.open(str(p), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(inter.tobytes())
    samples, _ = decode_wav_native(p.read_bytes())
    assert np.abs(samples).max() < 1e-6  # L and R cancel


def test_resample_tone_matches_scipy():
    sr_in, sr_out = 16000, 8000
    t = np.arange(sr_in) / sr_in
    sig = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    got = resample_native(sig, sr_in, sr_out)
    ref = resample_poly(sig, 1, 2).astype(np.float32)
    assert got.shape[0] == ref.shape[0]
    # compare away from the edges (different filter lengths)
    core = slice(200, -200)
    assert np.abs(got[core] - ref[core]).max() < 5e-3


def test_resample_upsample_preserves_tone():
    sr_in, sr_out = 16000, 24000
    t = np.arange(sr_in * 2) / sr_in
    sig = np.sin(2 * np.pi * 300 * t).astype(np.float32)
    got = resample_native(sig, sr_in, sr_out)
    assert abs(got.shape[0] - sr_out * 2) <= 2
    spec = np.abs(np.fft.rfft(got[:sr_out]))
    assert abs(np.argmax(spec) - 300) <= 1
    # amplitude preserved within 1%
    assert abs(got[1000:-1000].max() - 1.0) < 0.01


def test_rms_db():
    x = (np.ones(1000) * 0.1).astype(np.float32)
    assert abs(rms_db_native(x) - 20 * np.log10(0.1)) < 1e-6


def test_audiosegment_uses_native():
    from voiceprintrecognition_paddlepaddle_tpu.ops.audio import AudioSegment
    seg = AudioSegment.from_file(REF_WAV)
    assert seg.sample_rate == 16000 and seg.num_samples == 58752
    seg.resample(8000)
    assert abs(seg.num_samples - 29376) <= 1
