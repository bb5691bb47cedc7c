"""Short end-to-end training across every loss / classifier configuration:
validates the full wiring (PK batches for the triplet loss, K sub-centers,
SphereFace2's learnable bias passing through the optimizer, AMP, Linear
head) — one tiny epoch each."""

import wave as wave_mod

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy suite: excluded from the < 5-min fast tier

from voiceprintrecognition_paddlepaddle_tpu.trainer import Trainer

SR = 16000


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    root = tmp_path_factory.mktemp("losses")
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


def _cfg(root, loss_conf, classifier=None, enable_amp=False,
         is_use_pksampler=False):
    return {
        "dataset_conf": {
            "dataset": {"min_duration": 0.3, "max_duration": 1.0,
                        "sample_rate": SR, "use_dB_normalization": True,
                        "target_dB": -20},
            "sampler": {"batch_size": 8, "shuffle": True, "drop_last": True},
            "dataLoader": {"num_workers": 2},
            "eval_conf": {"batch_size": 4, "max_duration": 2},
            "train_list": str(root / "train.txt"),
            "enroll_list": None, "trials_list": None,
            "is_use_pksampler": is_use_pksampler,
            "sample_per_id": 2,
        },
        "preprocess_conf": {"feature_method": "Fbank",
                            "method_args": {"sr": SR, "n_mels": 40}},
        "model_conf": {"model": "TDNN",
                       "model_args": {"embd_dim": 16, "channels": 16,
                                      "pooling_type": "TAP"},
                       "classifier": classifier or {
                           "classifier_type": "Cosine", "num_speakers": 4}},
        "loss_conf": loss_conf,
        "optimizer_conf": {"optimizer": "Adam", "optimizer_args": {},
                           "scheduler": "WarmupCosineSchedulerLR",
                           "scheduler_args": {"learning_rate": 0.01,
                                              "min_lr": 1.0e-5,
                                              "warmup_epoch": 1}},
        "train_conf": {"enable_amp": enable_amp, "max_epoch": 1,
                       "log_interval": 10},
    }


LOSS_CASES = [
    ({"loss": "AAMLoss", "loss_args": {"margin": 0.2},
      "use_margin_scheduler": True}, None, False),
    ({"loss": "AMLoss", "loss_args": {"margin": 0.2}}, None, False),
    ({"loss": "ARMLoss", "loss_args": {"margin": 0.2}}, None, False),
    ({"loss": "CELoss", "loss_args": {}}, None, False),
    ({"loss": "SphereFace2", "loss_args": {"margin": 0.2}}, None, False),
    ({"loss": "SubCenterLoss", "loss_args": {"margin": 0.2, "K": 2}},
     {"classifier_type": "Cosine", "num_speakers": 4, "K": 2}, False),
    # TripletAngularMarginLoss auto-switches to the PK sampler
    ({"loss": "TripletAngularMarginLoss", "loss_args": {"margin": 0.5}},
     None, False),
]


@pytest.mark.parametrize("loss_conf,classifier,amp", LOSS_CASES,
                         ids=[c[0]["loss"] for c in LOSS_CASES])
def test_one_epoch(data, loss_conf, classifier, amp):
    trainer = Trainer(configs=_cfg(data, loss_conf, classifier,
                                   enable_amp=amp))
    trainer.train(save_model_path=None, log_dir=None, do_eval=False)
    assert int(trainer.state.step) > 0
    assert trainer.train_loss is None or np.isfinite(trainer.train_loss)
    if loss_conf["loss"] == "SphereFace2":
        # the learnable bias must exist and have been updated
        bias = float(trainer.state.loss_params["sphereface2_bias"])
        assert np.isfinite(bias) and bias != 0.0


def test_amp_bf16_epoch(data):
    trainer = Trainer(configs=_cfg(data, {"loss": "AAMLoss",
                                          "loss_args": {"margin": 0.2}},
                                   enable_amp=True))
    trainer.train(save_model_path=None, log_dir=None, do_eval=False)
    assert int(trainer.state.step) > 0
    # params stay fp32 even with bf16 compute
    import jax
    dtypes = {p.dtype for p in jax.tree.leaves(trainer.state.params)}
    assert all(d == np.float32 for d in dtypes)


def test_remat_epoch(data):
    cfg = _cfg(data, {"loss": "AAMLoss", "loss_args": {"margin": 0.2}})
    cfg["train_conf"]["enable_remat"] = True
    trainer = Trainer(configs=cfg)
    trainer.train(save_model_path=None, log_dir=None, do_eval=False)
    assert int(trainer.state.step) > 0


def test_linear_classifier_epoch(data):
    trainer = Trainer(configs=_cfg(
        data, {"loss": "CELoss", "loss_args": {}},
        classifier={"classifier_type": "Linear", "num_speakers": 4}))
    trainer.train(save_model_path=None, log_dir=None, do_eval=False)
    assert int(trainer.state.step) > 0


def test_noise_reverb_banks_e2e(data, tmp_path):
    """Full epoch with on-device noise mixing + RIR reverb from banks."""
    from voiceprintrecognition_paddlepaddle_tpu.ops.audio import AudioSegment
    rng = np.random.RandomState(0)
    for d, make in (("noise", lambda: rng.randn(SR).astype(np.float32) * 0.1),
                    ("reverb", lambda: np.concatenate(
                        [[1.0], rng.randn(3999) * np.exp(
                            -np.arange(3999) / 800)]).astype(np.float32))):
        (tmp_path / d).mkdir()
        for i in range(2):
            AudioSegment(make(), SR).to_wav_file(
                str(tmp_path / d / f"{i}.wav"))
    aug = {"speed": {"prob": 0.5},
           "volume": {"prob": 0.5, "min_gain_dBFS": -6, "max_gain_dBFS": 6},
           "noise": {"prob": 0.8, "noise_dir": str(tmp_path / "noise"),
                     "min_snr_dB": 10, "max_snr_dB": 30},
           "reverb": {"prob": 0.8, "reverb_dir": str(tmp_path / "reverb")},
           "spec_aug": {"prob": 0.5, "max_time_warp": 3}}
    trainer = Trainer(configs=_cfg(data, {"loss": "AAMLoss",
                                          "loss_args": {"margin": 0.2}}),
                      data_augment_configs=aug)
    trainer.train(save_model_path=None, log_dir=None, do_eval=False)
    assert int(trainer.state.step) > 0
    assert trainer.augmenter.noise_bank is not None
    assert trainer.augmenter.rir_bank is not None


def test_speed_perturb_3class_grows_classifier(data):
    aug = {"speed": {"prob": 1.0, "speed_perturb_3_class": True}}
    trainer = Trainer(configs=_cfg(data, {"loss": "AAMLoss",
                                          "loss_args": {"margin": 0.2}}),
                      data_augment_configs=aug)
    trainer.train(save_model_path=None, log_dir=None, do_eval=False)
    # classifier weight must be (emb, 4*3)
    w = trainer.state.params["classifier"]["weight"]
    assert w.shape[-1] == 12
