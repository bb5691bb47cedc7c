"""Generate the demo assets the reference ships as recorded audio
(reference ``dataset/a_1.wav .. b_2.wav, test_long.wav`` and the seeded
``audio_db/``): synthetic vowel-like voices (glottal pulse train + formant
resonators + noise), distinct per "speaker", so the contrast / recognition /
diarization CLIs run out of the box without any copyrighted audio.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from voiceprintrecognition_paddlepaddle_tpu.ops.audio import AudioSegment

SR = 16000


def synth_voice(f0, formants, seconds, seed=0, vibrato=5.0):
    """Glottal-pulse excitation through 2nd-order formant resonators."""
    rng = np.random.RandomState(seed)
    n = int(seconds * SR)
    t = np.arange(n) / SR
    # slowly varying pitch with vibrato + jitter
    f0_t = f0 * (1 + 0.03 * np.sin(2 * np.pi * vibrato * t)
                 + 0.01 * np.cumsum(rng.randn(n)) / np.sqrt(np.arange(1, n + 1)))
    phase = 2 * np.pi * np.cumsum(f0_t) / SR
    # pulse train approximated by a sum of harmonics with 1/h rolloff
    exc = sum(np.sin(h * phase) / h for h in range(1, 12))
    exc += 0.1 * rng.randn(n)
    # formant filtering: cascade of resonators
    out = exc
    for fc, bw in formants:
        r = np.exp(-np.pi * bw / SR)
        theta = 2 * np.pi * fc / SR
        b0 = 1 - r
        a1, a2 = -2 * r * np.cos(theta), r * r
        y = np.zeros(n)
        y1 = y2 = 0.0
        for i in range(n):
            y0 = b0 * out[i] - a1 * y1 - a2 * y2
            y2, y1 = y1, y0
            y[i] = y0
        out = y
    # amplitude envelope: syllable-like modulation
    env = 0.55 + 0.45 * np.sin(2 * np.pi * 2.5 * t + rng.rand() * 6)
    out = out * env
    return (0.4 * out / np.max(np.abs(out))).astype(np.float32)


SPEAKERS = {
    "a": (120, [(700, 90), (1220, 110), (2600, 160)]),   # low voice
    "b": (210, [(850, 100), (2100, 120), (3000, 180)]),  # higher voice
}


def main(out_dir="dataset", db_dir="audio_db"):
    os.makedirs(out_dir, exist_ok=True)
    for name, (f0, formants) in SPEAKERS.items():
        for i in (1, 2):
            seg = AudioSegment(
                synth_voice(f0, formants, 3.5, seed=i * 7), SR)
            seg.to_wav_file(os.path.join(out_dir, f"{name}_{i}.wav"))
    # long two-speaker conversation for diarization
    parts = []
    for turn in range(6):
        name = "a" if turn % 2 == 0 else "b"
        f0, formants = SPEAKERS[name]
        parts.append(synth_voice(f0, formants, 4.0, seed=100 + turn))
        parts.append(np.zeros(int(0.8 * SR), np.float32))
    AudioSegment(np.concatenate(parts), SR).to_wav_file(
        os.path.join(out_dir, "test_long.wav"))
    # seeded voiceprint database (two users, like the reference audio_db/)
    for user, spk in (("user_a", "a"), ("user_b", "b")):
        os.makedirs(os.path.join(db_dir, user), exist_ok=True)
        f0, formants = SPEAKERS[spk]
        AudioSegment(synth_voice(f0, formants, 3.0, seed=999), SR).to_wav_file(
            os.path.join(db_dir, user, "0.wav"))
    print(f"demo assets written to {out_dir}/ and {db_dir}/")


if __name__ == "__main__":
    main()
