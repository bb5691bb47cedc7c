import numpy as np

from voiceprintrecognition_paddlepaddle_tpu.metric import (
    compute_dcf, compute_eer, compute_fnr_fpr)
from voiceprintrecognition_paddlepaddle_tpu.utils.utils import (
    cal_accuracy, cal_accuracy_threshold, cosin_metric)


def test_eer_perfect_separation():
    scores = np.array([0.9, 0.8, 0.85, 0.1, 0.2, 0.15], dtype=np.float32)
    labels = np.array([1, 1, 1, 0, 0, 0], dtype=np.int32)
    fnr, fpr, _ = compute_fnr_fpr(scores, labels)
    eer, thr = compute_eer(fnr, fpr, scores)
    assert eer <= 1 / 3  # perfectly separable -> crossing at/below 1/3
    assert 0.1 <= thr <= 0.9


def test_eer_random_scores_near_half():
    rng = np.random.RandomState(0)
    scores = rng.rand(20000).astype(np.float32)
    labels = (rng.rand(20000) > 0.5).astype(np.int32)
    fnr, fpr, _ = compute_fnr_fpr(scores, labels)
    eer = compute_eer(fnr, fpr)
    assert abs(eer - 0.5) < 0.02


def test_eer_degenerate_trials_raise_clear_error():
    # a trials list with no target (same-speaker) pairs: the curve
    # construction itself is 0/0 — must be a ValueError (with no
    # RuntimeWarning spray), not a NaN curve or a bare IndexError
    import pytest

    scores = np.array([0.9, 0.1], dtype=np.float32)
    labels = np.array([0, 0], dtype=np.int32)  # non-target only
    with pytest.raises(ValueError, match="target"), \
            np.errstate(invalid="raise", divide="raise"):
        compute_fnr_fpr(scores, labels)


def test_eer_noncrossing_curves_raise_clear_error():
    # curves exist (both classes present) but never cross: perfectly
    # inverted scores put FNR above FPR everywhere except the forced
    # endpoints — compute_eer's own guard must catch the empty side
    import pytest

    fnr = np.array([0.1, 0.2, 0.3])
    fpr = np.array([1.0, 0.9, 0.6])  # diff < 0 everywhere
    with pytest.raises(ValueError, match="cross"):
        compute_eer(fnr, fpr)


def test_dcf_bounds():
    rng = np.random.RandomState(1)
    tgt = rng.normal(1.0, 0.5, 5000)
    imp = rng.normal(-1.0, 0.5, 5000)
    scores = np.concatenate([tgt, imp]).astype(np.float32)
    labels = np.concatenate([np.ones(5000), np.zeros(5000)]).astype(np.int32)
    fnr, fpr, _ = compute_fnr_fpr(scores, labels)
    dcf = compute_dcf(fnr, fpr)
    assert 0.0 <= dcf <= 1.0
    eer = compute_eer(fnr, fpr)
    assert eer < 0.05


def test_weighted_fnr_fpr_matches_duplication():
    rng = np.random.RandomState(3)
    scores = rng.rand(200).astype(np.float32)
    labels = (rng.rand(200) > 0.5).astype(np.int32)
    w = rng.randint(1, 4, size=200).astype(np.float64)
    fnr_w, fpr_w, _ = compute_fnr_fpr(scores, labels, w)
    # duplicating samples by their integer weight must give the same EER
    s2 = np.repeat(scores, w.astype(int))
    l2 = np.repeat(labels, w.astype(int))
    fnr_d, fpr_d, _ = compute_fnr_fpr(s2, l2)
    assert np.isclose(compute_eer(fnr_w, fpr_w), compute_eer(fnr_d, fpr_d), atol=1e-9)
    assert np.isclose(fnr_w[-1], fnr_d[-1])  # both end at 1.0


def test_accuracy_threshold():
    scores = np.array([0.9, 0.8, 0.2, 0.1])
    labels = np.array([1, 1, 0, 0])
    acc, thr = cal_accuracy_threshold(scores, labels)
    assert acc == 1.0
    assert 0.2 < thr <= 0.8
    assert cal_accuracy(scores, labels, threshold=thr) == 1.0


def test_cosin_metric():
    a = np.array([1.0, 0.0])
    assert np.isclose(cosin_metric(a, a), 1.0)
    assert np.isclose(cosin_metric(a, np.array([0.0, 1.0])), 0.0)
