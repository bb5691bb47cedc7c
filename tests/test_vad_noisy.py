"""Noisy-scene VAD + diarization: the spectral VAD must keep DER under
budget on a babble-bedded two-speaker scene where the plain energy gate
measurably degrades (round-1 VERDICT item #7; reference diarization rests
on yeaudio's VAD quality, ``infer_utils/speaker_diarization.py:37``).

The "speakers" are harmonic stacks with distinct fundamentals; chunk
embeddings for clustering are Fbank mean vectors (spectral fingerprints) —
deterministic, model-free, and enough for the spectral clustering to
separate the two sources, so the DER measures the VAD + chunking +
clustering + postprocess chain.
"""

import numpy as np
import pytest

from voiceprintrecognition_paddlepaddle_tpu.infer_utils.der import (
    diarization_error_rate)
from voiceprintrecognition_paddlepaddle_tpu.infer_utils.speaker_diarization \
    import SpeakerDiarization
from voiceprintrecognition_paddlepaddle_tpu.ops import kaldi
from voiceprintrecognition_paddlepaddle_tpu.ops.audio import AudioSegment

SR = 16000


def _voice(f0, t, rng):
    """Harmonic stack with pitch jitter + amplitude modulation — crude but
    speech-band and non-stationary like voiced speech."""
    sig = np.zeros_like(t)
    f0_t = f0 * (1.0 + 0.02 * np.sin(2 * np.pi * 2.3 * t + rng.rand()))
    phase = 2 * np.pi * np.cumsum(f0_t) / SR
    for h in range(1, 9):
        sig += np.sin(h * phase + rng.rand()) / h
    am = 0.7 + 0.3 * np.sin(2 * np.pi * 3.7 * t + rng.rand())
    return sig * am


def _babble(n, rng, n_talkers=12):
    """Speech-shaped noise bed: Gaussian noise with a 1/f spectral tilt
    plus a few slowly-modulated narrowband tracks and ±2 dB level wander —
    the spectrum and non-stationarity of a distant-crowd babble without
    pathological per-bin silences."""
    t = np.arange(n) / SR
    spec = np.fft.rfft(rng.randn(n))
    freqs = np.fft.rfftfreq(n, 1.0 / SR)
    spec *= 1.0 / np.sqrt(np.maximum(freqs, 60.0))      # 1/f tilt
    out = np.fft.irfft(spec, n)
    out /= np.std(out)
    for _ in range(n_talkers):
        f = rng.uniform(150, 3000)
        am = 0.8 + 0.2 * np.sin(2 * np.pi * rng.uniform(0.5, 3) * t
                                + rng.rand() * 6.28)
        out += 0.12 * am * np.sin(2 * np.pi * f * t + rng.rand() * 6.28)
    wander = 10 ** (2.0 * np.sin(2 * np.pi * 0.07 * t + rng.rand()) / 20.0)
    out *= wander
    return out / np.std(out)


@pytest.fixture(scope="module")
def noisy_scene():
    """~28 s: A/B alternate 3 s utterances with 1.5 s gaps; babble bed at
    ~8 dB SNR everywhere (including the gaps)."""
    rng = np.random.RandomState(0)
    utt, gap = 3.0, 1.5
    speakers = [0, 1, 0, 1, 0, 1]
    f0s = [125.0, 290.0]
    total = gap + len(speakers) * (utt + gap)
    n = int(total * SR)
    sig = np.zeros(n)
    ref = []
    cursor = gap
    for spk in speakers:
        a, b = int(cursor * SR), int((cursor + utt) * SR)
        t = np.arange(b - a) / SR
        v = _voice(f0s[spk], t, rng)
        sig[a:b] += v / np.std(v)
        ref.append((cursor, cursor + utt, f"spk{spk}"))
        cursor += utt + gap
    snr_db = 8.0
    noise = _babble(n, rng) * (10 ** (-snr_db / 20.0))
    audio = (sig + noise) * 0.1
    return audio.astype(np.float32), ref


def _run_diarization(audio, vad_method):
    seg = AudioSegment(audio.copy(), SR)
    sd = SpeakerDiarization()
    # segments_audio but with a selectable VAD method
    vad_segments = []
    for tseg in seg.vad(return_seconds=True, method=vad_method):
        st, ed = round(tseg["start"], 3), round(tseg["end"], 3)
        vad_segments.append([st, ed, seg.samples[int(st * SR):int(ed * SR)]])
    if not vad_segments:
        return []
    chunks = sd._chunk(vad_segments)
    # spectral-fingerprint embeddings (model-free, deterministic); raw
    # fbank, NOT the CMN'd featurizer output (CMN zeroes the time-mean)
    waves = np.stack([c[2] for c in chunks])
    feats = np.asarray(kaldi.fbank(waves, sr=SR, n_mels=40))
    emb = feats.mean(axis=1)
    labels, _ = sd.clustering(emb, speaker_num=2)
    out = sd.postprocess(chunks, labels)
    return [(s["start"], s["end"], f"hyp{s['speaker']}") for s in out]


def test_spectral_vad_meets_der_budget(noisy_scene):
    audio, ref = noisy_scene
    hyp = _run_diarization(audio, "spectral")
    assert hyp, "spectral VAD found no speech"
    der = diarization_error_rate(ref, hyp, detailed=True)
    assert der["diarization error rate"] < 0.15, der


def test_energy_vad_degrades_on_babble(noisy_scene):
    """The round-1 energy gate must do measurably worse on the same scene
    (this is the regression the spectral VAD exists to fix). If this ever
    starts failing because the energy gate improved, move the budget."""
    audio, ref = noisy_scene
    hyp_e = _run_diarization(audio, "energy")
    der_e = (diarization_error_rate(ref, hyp_e)
             if hyp_e else 1.0)  # no speech found = 100% miss
    hyp_s = _run_diarization(audio, "spectral")
    der_s = diarization_error_rate(ref, hyp_s)
    assert der_e > der_s + 0.05, (der_e, der_s)


def test_spectral_vad_clean_speech_islands():
    """Sanity on clean audio: boundaries land near the truth."""
    rng = np.random.RandomState(1)
    n = int(10 * SR)
    sig = np.zeros(n)
    t = np.arange(3 * SR) / SR
    v = _voice(150.0, t, rng)
    sig[2 * SR:5 * SR] = 0.2 * v / np.std(v)
    out = AudioSegment(sig.astype(np.float32), SR).vad(method="spectral")
    assert len(out) == 1
    assert abs(out[0]["start"] - 2.0) < 0.35
    assert abs(out[0]["end"] - 5.0) < 0.45
