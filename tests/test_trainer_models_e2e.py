"""One tiny training epoch through every backbone family — catches
train-mode-only issues (BatchNorm mutation in NHWC models, stride paths,
AFF fusion under grad) that forward-only tests miss."""

import wave as wave_mod

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy suite: excluded from the < 5-min fast tier

from voiceprintrecognition_paddlepaddle_tpu.trainer import Trainer

SR = 16000


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    root = tmp_path_factory.mktemp("models_e2e")
    rng = np.random.RandomState(0)
    lines = []
    for spk in range(4):
        for u in range(4):
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
    return root


MODEL_CASES = [
    ("EcapaTdnn", {"embd_dim": 16, "channels": (32, 32, 32, 32, 96),
                   "res2net_scale": 4, "se_channels": 16,
                   "attention_channels": 16}),
    ("CAMPPlus", {"embd_dim": 16, "growth_rate": 4, "bn_size": 2,
                  "init_channels": 16}),
    ("Res2Net", {"embd_dim": 16, "m_channels": 8, "layers": (1, 1, 1, 1)}),
    ("ResNetSE", {"embd_dim": 16, "layers": (1, 1, 1, 1),
                  "num_filters": (8, 8, 16, 16)}),
    ("ERes2NetV2", {"embd_dim": 16, "m_channels": 8,
                    "num_blocks": (1, 1, 1, 1)}),
    ("ERes2Net", {"embd_dim": 16, "m_channels": 8,
                  "num_blocks": (1, 1, 1, 1)}),
]


@pytest.mark.parametrize("model,args", MODEL_CASES,
                         ids=[c[0] for c in MODEL_CASES])
def test_one_epoch(data, model, args):
    cfg = {
        "dataset_conf": {
            "dataset": {"min_duration": 0.3, "max_duration": 1.0,
                        "sample_rate": SR, "use_dB_normalization": True,
                        "target_dB": -20},
            "sampler": {"batch_size": 8, "shuffle": True, "drop_last": True},
            "dataLoader": {"num_workers": 2},
            "eval_conf": {"batch_size": 4, "max_duration": 2},
            "train_list": str(data / "train.txt"),
            "enroll_list": None, "trials_list": None,
        },
        "preprocess_conf": {"feature_method": "Fbank",
                            "method_args": {"sr": SR, "n_mels": 32}},
        "model_conf": {"model": model, "model_args": args,
                       "classifier": {"classifier_type": "Cosine",
                                      "num_speakers": 4}},
        "loss_conf": {"loss": "AAMLoss", "loss_args": {"margin": 0.2}},
        "optimizer_conf": {"optimizer": "Adam", "optimizer_args": {},
                           "scheduler": "WarmupCosineSchedulerLR",
                           "scheduler_args": {"learning_rate": 0.01,
                                              "min_lr": 1.0e-5,
                                              "warmup_epoch": 1}},
        "train_conf": {"enable_amp": False, "max_epoch": 1,
                       "log_interval": 1},
    }
    trainer = Trainer(configs=cfg)
    trainer.train(save_model_path=None, log_dir=None, do_eval=False)
    assert int(trainer.state.step) == 2  # 16 samples / batch 8
    assert np.isfinite(trainer.train_loss)
    # batch stats were actually mutated in training
    import jax
    stats = jax.tree.leaves(trainer.state.batch_stats["backbone"])
    assert any(np.abs(np.asarray(s)).sum() > 0 for s in stats)
