"""The stack actually learns: a tiny model overfits 4 synthetic speakers —
training accuracy climbs and eval EER beats chance by a wide margin."""

import wave as wave_mod

import numpy as np
import pytest

from voiceprintrecognition_paddlepaddle_tpu.trainer import Trainer

SR = 16000


def _voice(f0, seconds, seed):
    rng = np.random.RandomState(seed)
    t = np.arange(int(seconds * SR)) / SR
    f0_t = f0 * (1 + 0.02 * np.sin(2 * np.pi * 3 * t))
    phase = 2 * np.pi * np.cumsum(f0_t) / SR
    sig = sum(np.sin(h * phase) / h for h in range(1, 6))
    sig += 0.05 * rng.randn(len(t))
    return (0.3 * sig / np.abs(sig).max()).astype(np.float32)


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    root = tmp_path_factory.mktemp("learn")
    train, enroll, trials = [], [], []
    for spk, f0 in enumerate([110, 170, 260, 400]):
        for u in range(8):
            p = root / f"s{spk}_u{u}.wav"
            sig = _voice(f0, 1.5, seed=spk * 100 + u)
            with wave_mod.open(str(p), "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(SR)
                w.writeframes((sig * 32767).astype("<i2").tobytes())
            line = f"{p}\t{spk}"
            (train if u < 5 else (enroll if u < 6 else trials)).append(line)
    for name, lines in (("train", train), ("enroll", enroll),
                        ("trials", trials)):
        (root / f"{name}.txt").write_text("\n".join(lines) + "\n",
                                          encoding="utf-8")
    return root


def test_overfit_and_eer(data):
    cfg = {
        "dataset_conf": {
            "dataset": {"min_duration": 0.3, "max_duration": 1.0,
                        "sample_rate": SR, "use_dB_normalization": True,
                        "target_dB": -20},
            "sampler": {"batch_size": 10, "shuffle": True, "drop_last": True},
            "dataLoader": {"num_workers": 2},
            "eval_conf": {"batch_size": 4, "max_duration": 2},
            "train_list": str(data / "train.txt"),
            "enroll_list": str(data / "enroll.txt"),
            "trials_list": str(data / "trials.txt"),
        },
        "preprocess_conf": {"feature_method": "Fbank",
                            "method_args": {"sr": SR, "n_mels": 40}},
        "model_conf": {"model": "TDNN",
                       "model_args": {"embd_dim": 24, "channels": 32,
                                      "pooling_type": "TSP"},
                       "classifier": {"classifier_type": "Cosine",
                                      "num_speakers": 4}},
        "loss_conf": {"loss": "AAMLoss",
                      "loss_args": {"margin": 0.0, "scale": 32}},
        "optimizer_conf": {"optimizer": "Adam", "optimizer_args": {},
                           "scheduler": "WarmupCosineSchedulerLR",
                           "scheduler_args": {"learning_rate": 0.02,
                                              "min_lr": 1.0e-3,
                                              "warmup_epoch": 2}},
        "train_conf": {"enable_amp": False, "max_epoch": 25,
                       "log_interval": 50},
    }
    trainer = Trainer(configs=cfg)
    trainer.train(save_model_path=None, log_dir=None, do_eval=False)
    # final logged training accuracy should show real learning
    assert trainer.train_acc is not None and trainer.train_acc >= 0.6, \
        f"train acc {trainer.train_acc}"
    eer, min_dcf, thr = trainer.evaluate()
    assert eer <= 0.30, f"EER {eer} — model failed to learn"


def test_train_without_saving(data):
    """save_model_path=None path used above must not have written files."""
    import glob
    assert not glob.glob("models/TDNN_Fbank/epoch_*")
