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


def test_load_batch_native_matches_per_item(tmp_path):
    """The GIL-free C++ batch loader must reproduce the per-item python
    pipeline: decode + crop + int16 quantize (no speed perturb), plus
    correct valid lengths and durations."""
    import wave as wave_mod
    from voiceprintrecognition_paddlepaddle_tpu.native import \
        load_batch_native

    sr = 16000
    rng = np.random.RandomState(0)
    paths, raws = [], []
    for i, seconds in enumerate([1.0, 2.5, 4.0]):
        sig = (rng.randn(int(sr * seconds)) * 0.1).astype(np.float32)
        p = tmp_path / f"b{i}.wav"
        with wave_mod.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(
                (np.clip(sig, -1, 1) * 32767).astype("<i2").tobytes())
        paths.append(str(p))
        raws.append(np.clip(sig, -1, 1))

    target = 3 * sr
    out, valid, dur = load_batch_native(paths, sr, target,
                                        crop_fracs=[0.0, 0.0, 0.0])
    assert out.shape == (3, target) and out.dtype == np.int16
    assert list(valid) == [sr, int(2.5 * sr), target]
    assert np.allclose(dur, [1.0, 2.5, 4.0], atol=1e-3)
    for i, raw in enumerate(raws):
        got = out[i, :valid[i]]
        ref16 = (np.clip(raw, -1, 1) * 32767).astype("<i2")[:target]
        # decode divides by 32768; quantize multiplies by 32767 ->
        # values match within 1 LSB
        assert np.abs(got.astype(np.int32)
                      - ref16[:valid[i]].astype(np.int32)).max() <= 1
        if valid[i] < target:
            assert np.abs(out[i, valid[i]:]).max() == 0


def test_load_batch_native_speed_and_crop(tmp_path):
    import wave as wave_mod
    from voiceprintrecognition_paddlepaddle_tpu.native import \
        load_batch_native

    sr = 16000
    t = np.arange(4 * sr) / sr
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = tmp_path / "tone.wav"
    with wave_mod.open(str(p), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((sig * 32767).astype("<i2").tobytes())

    target = 3 * sr
    out, valid, dur = load_batch_native(
        [str(p), str(p), str(p)], sr, target,
        speeds=[(1, 1), (9, 10), (11, 10)],
        crop_fracs=[0.5, 0.5, 0.5])
    assert list(valid) == [target, target, target]
    # pitch scales with speed: 440 * speed
    for i, speed in enumerate([1.0, 0.9, 1.1]):
        x = out[i].astype(np.float32) / 32767.0
        spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
        freqs = np.fft.rfftfreq(len(x), 1.0 / sr)
        peak = freqs[np.argmax(spec)]
        assert abs(peak - 440 * speed) < 5, (speed, peak)


def test_dataset_load_batch_matches_getitem(tmp_path):
    """SpeakerDataset.load_batch (native) vs __getitem__ (python) on the
    same list without augmentation: identical int16 batches."""
    import wave as wave_mod
    from voiceprintrecognition_paddlepaddle_tpu.data_utils.reader import \
        SpeakerDataset

    sr = 16000
    rng = np.random.RandomState(1)
    lines = []
    for i in range(4):
        sig = (rng.randn(int(sr * (1.0 + i))) * 0.1).astype(np.float32)
        p = tmp_path / f"d{i}.wav"
        with wave_mod.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(
                (np.clip(sig, -1, 1) * 32767).astype("<i2").tobytes())
        lines.append(f"{p}\t{i}")
    lst = tmp_path / "list.txt"
    lst.write_text("\n".join(lines) + "\n", encoding="utf-8")

    ds = SpeakerDataset(data_list_path=str(lst), mode="train",
                        max_duration=2, min_duration=0.5, seed=7)
    items = ds.load_batch([0, 1, 2, 3])
    assert items is not None
    ds2 = SpeakerDataset(data_list_path=str(lst), mode="train",
                         max_duration=2, min_duration=0.5, seed=7)
    for i in range(4):
        w_n, lab_n, v_n = items[i]
        w_p, lab_p, v_p = ds2[i]
        assert lab_n == lab_p and v_n == v_p
        q = (np.clip(w_p, -1, 1) * 32767).astype(np.int16)
        # crop starts differ only through RNG stream; for items shorter
        # than target there is no crop -> must match exactly
        if len(w_p) >= v_p and v_p <= 2 * sr and i < 2:
            assert np.abs(w_n[:v_n].astype(np.int32)
                          - q[:v_n].astype(np.int32)).max() <= 1


def test_load_batch_native_bad_items_flag_not_crash(tmp_path):
    """Unreadable items — missing file, truncated header, garbage bytes,
    corrupt chunk-size field — must come back valid=-1 for the Python
    fallback while healthy neighbours still load."""
    import wave as wave_mod
    from voiceprintrecognition_paddlepaddle_tpu.native import \
        load_batch_native

    sr = 16000
    sig = np.sin(2 * np.pi * 220 * np.arange(sr) / sr).astype(np.float32)
    good = tmp_path / "good.wav"
    with wave_mod.open(str(good), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((sig * 32767).astype("<i2").tobytes())

    truncated = tmp_path / "trunc.wav"
    truncated.write_bytes(good.read_bytes()[:30])
    garbage = tmp_path / "garbage.wav"
    garbage.write_bytes(b"\x00" * 4096)
    # valid RIFF framing, but the data chunk claims UINT32_MAX bytes
    evil = tmp_path / "evil.wav"
    body = good.read_bytes()
    evil.write_bytes(body[:40] + b"\xff\xff\xff\xff" + body[44:])

    paths = [str(good), str(tmp_path / "missing.wav"), str(truncated),
             str(garbage), str(evil), str(good)]
    out, valid, dur = load_batch_native(paths, sr, sr)
    assert valid[0] == sr and valid[5] == sr   # healthy items unaffected
    assert valid[1] < 0 and valid[2] < 0 and valid[3] < 0
    # the evil file's clamped data chunk still decodes (clamp to EOF)
    # or is rejected — either way no crash and no garbage length
    assert valid[4] <= sr
    assert np.abs(out[1]).max() == 0
