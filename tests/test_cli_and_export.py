"""Trainer.export → Predictor roundtrip, and CLI script smoke tests run as
subprocesses on the demo assets (the reference's de-facto validation
strategy, SURVEY.md §4)."""

import json
import os
import subprocess
import sys
import wave as wave_mod

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy suite: excluded from the < 5-min fast tier
import yaml

from voiceprintrecognition_paddlepaddle_tpu.predict import Predictor
from voiceprintrecognition_paddlepaddle_tpu.trainer import Trainer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SR = 16000


def _cfg(root, save=None):
    return {
        "dataset_conf": {
            "dataset": {"min_duration": 0.3, "max_duration": 1.0,
                        "sample_rate": SR, "use_dB_normalization": True,
                        "target_dB": -20},
            "sampler": {"batch_size": 8, "shuffle": True, "drop_last": True},
            "dataLoader": {"num_workers": 2},
            "eval_conf": {"batch_size": 4, "max_duration": 2},
            "train_list": str(root / "train.txt"),
            "enroll_list": str(root / "train.txt"),
            "trials_list": str(root / "train.txt"),
        },
        "preprocess_conf": {"feature_method": "Fbank",
                            "method_args": {"sr": SR, "n_mels": 40}},
        "model_conf": {"model": "TDNN",
                       "model_args": {"embd_dim": 24, "channels": 24,
                                      "pooling_type": "TAP"},
                       "classifier": {"classifier_type": "Cosine",
                                      "num_speakers": 4}},
        "loss_conf": {"loss": "AAMLoss", "loss_args": {"margin": 0.2}},
        "optimizer_conf": {"optimizer": "Adam", "optimizer_args": {},
                           "scheduler": "WarmupCosineSchedulerLR",
                           "scheduler_args": {"learning_rate": 0.01,
                                              "min_lr": 1.0e-5,
                                              "warmup_epoch": 1}},
        "train_conf": {"enable_amp": False, "max_epoch": 1,
                       "log_interval": 10},
    }


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    lines = []
    rng = np.random.RandomState(0)
    for spk in range(4):
        for u in range(3):
            p = root / f"s{spk}_{u}.wav"
            t = np.arange(SR) / SR
            sig = (0.3 * np.sin(2 * np.pi * (120 + spk * 70) * t)
                   + 0.02 * rng.randn(SR)).astype(np.float32)
            with wave_mod.open(str(p), "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(SR)
                w.writeframes((sig * 32767).astype("<i2").tobytes())
            lines.append(f"{p}\t{spk}")
    (root / "train.txt").write_text("\n".join(lines) + "\n", encoding="utf-8")
    cfg = _cfg(root)
    save = str(root / "models")
    Trainer(configs=cfg).train(save_model_path=save,
                               log_dir=str(root / "log"), do_eval=False)
    cfg_path = root / "config.yml"
    cfg_path.write_text(yaml.safe_dump(cfg), encoding="utf-8")
    return root, cfg, str(cfg_path), save


def test_export_then_predict(trained):
    root, cfg, cfg_path, save = trained
    trainer = Trainer(configs=cfg)
    infer_dir = trainer.export(
        save_model_path=save,
        resume_model=os.path.join(save, "TDNN_Fbank", "last_model"))
    assert os.path.exists(os.path.join(infer_dir, "model.msgpack"))
    assert os.path.exists(os.path.join(infer_dir, "inference.json"))
    # StableHLO static graph round-trips and computes the same embedding
    hlo_path = os.path.join(infer_dir, "model.stablehlo")
    assert os.path.exists(hlo_path)
    import jax
    import jax.numpy as jnp
    with open(hlo_path, "rb") as f:
        exported = jax.export.deserialize(f.read())
    wave = np.zeros((1, SR * 3), np.float32)
    wave[0, :SR] = 0.1 * np.sin(np.linspace(0, 800, SR))
    out = exported.call(jnp.asarray(wave))
    assert np.asarray(out).shape == (1, 24)
    # the default export has a SYMBOLIC batch dim: any batch size works
    out3 = exported.call(jnp.asarray(np.tile(wave, (3, 1))))
    assert np.asarray(out3).shape == (3, 24)
    assert np.allclose(np.asarray(out3)[0], np.asarray(out)[0], atol=1e-5)
    pred = Predictor(configs=cfg, model_path=infer_dir)
    emb = pred.predict(str(root / "s0_0.wav"))
    assert emb.shape == (24,)
    # exported backbone matches the checkpointed one
    pred2 = Predictor(configs=cfg,
                      model_path=os.path.join(save, "TDNN_Fbank",
                                              "last_model"))
    emb2 = pred2.predict(str(root / "s0_0.wav"))
    assert np.allclose(emb, emb2, atol=1e-5)


def test_export_length_polymorphic_campplus(tmp_path):
    """``export_seconds=None`` emits ONE StableHLO module whose audio length
    is symbolic (``160*f + 240`` samples = ``f`` Kaldi frames), so a single
    artifact serves every duration bucket. CAM++ is the hard case: its
    CAMLayer seg-pooling needs dim-expression-safe ceil/count arithmetic."""
    import jax
    import jax.numpy as jnp
    from voiceprintrecognition_paddlepaddle_tpu.data_utils.featurizer import (
        AudioFeaturizer)
    from voiceprintrecognition_paddlepaddle_tpu.ops.features import (
        compute_feature)
    from voiceprintrecognition_paddlepaddle_tpu.utils.checkpoint import (
        save_msgpack)

    cfg = _cfg(tmp_path)
    cfg["preprocess_conf"]["method_args"]["n_mels"] = 40
    cfg["model_conf"] = {
        "model": "CAMPPlus",
        "model_args": {"embd_dim": 16, "init_channels": 16, "growth_rate": 8},
        "classifier": {"classifier_type": "Cosine", "num_speakers": 4}}
    t = Trainer(configs=cfg)
    t.audio_featurizer = AudioFeaturizer(
        feature_method="Fbank", method_args={"sr": SR, "n_mels": 40})
    t._Trainer__setup_model(input_size=40)
    ckpt = tmp_path / "ck"
    ckpt.mkdir()
    save_msgpack(jax.device_get(
        {"params": t.state.params, "batch_stats": t.state.batch_stats,
         "loss_params": t.state.loss_params}), str(ckpt / "model.msgpack"))
    (ckpt / "model.state").write_text('{"last_epoch": 0}', encoding="utf-8")

    infer_dir = Trainer(configs=cfg).export(
        save_model_path=str(tmp_path / "m"), resume_model=str(ckpt),
        export_seconds=None)
    hlo = os.path.join(infer_dir, "model.stablehlo")
    assert os.path.exists(hlo), "symbolic-length StableHLO export failed"
    with open(hlo, "rb") as f:
        exported = jax.export.deserialize(f.read())

    rng = np.random.RandomState(0)
    t2 = Trainer(configs=cfg)
    t2.audio_featurizer = AudioFeaturizer(
        feature_method="Fbank", method_args={"sr": SR, "n_mels": 40})
    t2._Trainer__setup_model(input_size=40)
    variables = {"params": t.state.params["backbone"],
                 "batch_stats": t.state.batch_stats["backbone"]}
    for secs, b in [(1.0, 1), (4.7, 2)]:
        f_frames = max(10, (int(SR * secs) - 240) // 160)
        wave = (0.1 * rng.randn(b, 160 * f_frames + 240)).astype(np.float32)
        out = np.asarray(exported.call(jnp.asarray(wave)))
        assert out.shape == (b, 16)
        feats = compute_feature(jnp.asarray(wave), "Fbank",
                                use_pallas=False, sr=SR, n_mels=40)
        ref = t2.model.apply(variables, feats, train=False)
        assert np.allclose(out, np.asarray(ref), atol=1e-5)


def _run(script, *args):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    return subprocess.run(
        [sys.executable, os.path.join(REPO, script), *args],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO)


def test_cli_infer_contrast(trained):
    root, cfg, cfg_path, save = trained
    r = _run("infer_contrast.py",
             f"--configs={cfg_path}",
             f"--model_path={os.path.join(save, 'TDNN_Fbank', 'last_model')}",
             f"--audio_path1={root / 's0_0.wav'}",
             f"--audio_path2={root / 's3_0.wav'}")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "similarity" in r.stdout


def test_cli_eval(trained):
    root, cfg, cfg_path, save = trained
    r = _run("eval.py",
             f"--configs={cfg_path}",
             f"--resume_model={os.path.join(save, 'TDNN_Fbank', 'last_model')}",
             f"--save_image_path={root / 'img'}")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "EER" in r.stderr or "EER" in r.stdout


def test_cli_diarization_on_demo_asset(trained):
    root, cfg, cfg_path, save = trained
    if not os.path.exists(os.path.join(REPO, "dataset", "test_long.wav")):
        pytest.skip("demo assets not generated")
    r = _run("infer_speaker_diarization.py",
             f"--configs={cfg_path}",
             f"--model_path={os.path.join(save, 'TDNN_Fbank', 'last_model')}",
             f"--audio_path={os.path.join(REPO, 'dataset', 'test_long.wav')}")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "speaker" in r.stdout
