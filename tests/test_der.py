import io

import numpy as np
import pytest

from voiceprintrecognition_paddlepaddle_tpu.infer_utils.der import (
    diarization_error_rate, load_rttm, write_rttm)


def test_perfect_hypothesis_zero_der():
    ref = [(0.0, 5.0, "A"), (5.0, 10.0, "B")]
    hyp = [(0.0, 5.0, "spk1"), (5.0, 10.0, "spk2")]
    assert diarization_error_rate(ref, hyp) == pytest.approx(0.0)


def test_label_permutation_invariant():
    ref = [(0.0, 5.0, "A"), (5.0, 10.0, "B")]
    hyp = [(0.0, 5.0, "B"), (5.0, 10.0, "A")]
    assert diarization_error_rate(ref, hyp) == pytest.approx(0.0)


def test_missed_detection():
    ref = [(0.0, 10.0, "A")]
    hyp = [(0.0, 5.0, "x")]
    d = diarization_error_rate(ref, hyp, detailed=True)
    assert d["missed detection"] == pytest.approx(0.5)
    assert d["false alarm"] == pytest.approx(0.0)
    assert d["diarization error rate"] == pytest.approx(0.5)


def test_false_alarm():
    ref = [(0.0, 5.0, "A")]
    hyp = [(0.0, 10.0, "x")]
    d = diarization_error_rate(ref, hyp, detailed=True)
    assert d["false alarm"] == pytest.approx(1.0)  # 5s FA / 5s ref speech
    assert d["missed detection"] == pytest.approx(0.0)


def test_confusion():
    ref = [(0.0, 6.0, "A"), (6.0, 10.0, "B")]
    # hyp swaps the final 2 s to the wrong speaker
    hyp = [(0.0, 6.0, "x"), (6.0, 8.0, "x"), (8.0, 10.0, "y")]
    d = diarization_error_rate(ref, hyp, detailed=True)
    assert d["confusion"] == pytest.approx(0.2)  # 2s / 10s
    assert d["diarization error rate"] == pytest.approx(0.2)


def test_overlap_handling():
    # 2 simultaneous ref speakers, hyp sees only one -> half missed
    ref = [(0.0, 10.0, "A"), (0.0, 10.0, "B")]
    hyp = [(0.0, 10.0, "x")]
    d = diarization_error_rate(ref, hyp, detailed=True)
    assert d["missed detection"] == pytest.approx(0.5)
    assert d["confusion"] == pytest.approx(0.0)


def test_rttm_roundtrip(tmp_path):
    segs = [{"speaker": "alice", "start": 0.0, "end": 2.5},
            {"speaker": "bob", "start": 2.5, "end": 4.0}]
    p = tmp_path / "x.rttm"
    with open(p, "w", encoding="utf-8") as f:
        write_rttm(f, "meeting1", segs)
    loaded = load_rttm(str(p))
    assert "meeting1" in loaded
    assert loaded["meeting1"][0] == (0.0, 2.5, "alice")
    assert loaded["meeting1"][1][1] == pytest.approx(4.0)
