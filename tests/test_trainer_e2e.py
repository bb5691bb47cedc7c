"""End-to-end smoke: synthetic 4-speaker dataset → train a tiny TDNN for a
few steps → loss decreases, checkpoint lands, auto-resume works, evaluate
returns EER/MinDCF (the reference validates end-to-end only by manual runs;
SURVEY.md §4)."""

import os
import wave as wave_mod

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy suite: excluded from the < 5-min fast tier

from voiceprintrecognition_paddlepaddle_tpu.trainer import Trainer

SR = 16000


def _write_wav(path, samples):
    with wave_mod.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes((np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes())


def _make_dataset(root, n_speakers=4, n_utts=6, seconds=1.2):
    """Speakers = distinct fundamental frequencies + noise."""
    rng = np.random.RandomState(0)
    lines = []
    os.makedirs(root / "wavs", exist_ok=True)
    t = np.arange(int(seconds * SR)) / SR
    for spk in range(n_speakers):
        f0 = 120 + 90 * spk
        for u in range(n_utts):
            sig = np.zeros_like(t)
            for h in range(1, 5):
                sig += np.sin(2 * np.pi * f0 * h * t + rng.rand()) / h
            sig += 0.05 * rng.randn(len(t))
            sig *= 0.3
            p = root / "wavs" / f"s{spk}_u{u}.wav"
            _write_wav(p, sig)
            lines.append(f"{p}\t{spk}")
    return lines


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    lines = _make_dataset(root)
    train_list = root / "train_list.txt"
    train_list.write_text("\n".join(lines) + "\n", encoding="utf-8")
    # enroll: first 3 utts; trials: last 3
    (root / "enroll.txt").write_text(
        "\n".join(l for l in lines if "_u0" in l or "_u1" in l or "_u2" in l)
        + "\n", encoding="utf-8")
    (root / "trials.txt").write_text(
        "\n".join(l for l in lines if "_u3" in l or "_u4" in l or "_u5" in l)
        + "\n", encoding="utf-8")
    return root


def _configs(root, max_epoch=2):
    return {
        "dataset_conf": {
            "dataset": {"min_duration": 0.3, "max_duration": 1.0,
                        "sample_rate": SR, "use_dB_normalization": True,
                        "target_dB": -20},
            "sampler": {"batch_size": 8, "shuffle": True, "drop_last": True},
            "dataLoader": {"num_workers": 2},
            "eval_conf": {"batch_size": 4, "max_duration": 2},
            "train_list": str(root / "train_list.txt"),
            "enroll_list": str(root / "enroll.txt"),
            "trials_list": str(root / "trials.txt"),
        },
        "preprocess_conf": {"feature_method": "Fbank",
                            "method_args": {"sr": SR, "n_mels": 40}},
        "model_conf": {
            "model": "TDNN",
            "model_args": {"embd_dim": 32, "channels": 32,
                           "pooling_type": "TSP"},
            "classifier": {"classifier_type": "Cosine", "num_speakers": 4,
                           "num_blocks": 0},
        },
        "loss_conf": {"loss": "AAMLoss",
                      "loss_args": {"margin": 0.2, "scale": 32},
                      "use_margin_scheduler": True,
                      "margin_scheduler_args": {"initial_margin": 0.0,
                                                "final_margin": 0.3}},
        "optimizer_conf": {"optimizer": "Adam",
                           "optimizer_args": {"weight_decay": 1.0e-6},
                           "scheduler": "WarmupCosineSchedulerLR",
                           "scheduler_args": {"learning_rate": 0.01,
                                              "min_lr": 1.0e-5,
                                              "warmup_epoch": 1}},
        "train_conf": {"enable_amp": False, "max_epoch": max_epoch,
                       "log_interval": 1},
    }


AUG = {"speed": {"prob": 0.5, "speed_perturb_3_class": False},
       "volume": {"prob": 0.2, "min_gain_dBFS": -15, "max_gain_dBFS": 15},
       "noise": None, "reverb": None,
       "spec_aug": {"prob": 0.5, "freq_mask_ratio": 0.1, "n_freq_masks": 1,
                    "time_mask_ratio": 0.05, "n_time_masks": 1}}


def test_train_eval_resume(workdir, tmp_path):
    save_dir = str(tmp_path / "models")
    trainer = Trainer(configs=_configs(workdir), data_augment_configs=AUG)
    trainer.train(save_model_path=save_dir, log_dir=str(tmp_path / "log"),
                  do_eval=True)
    ckpt = os.path.join(save_dir, "TDNN_Fbank")
    assert os.path.exists(os.path.join(ckpt, "last_model", "model.msgpack"))
    assert os.path.exists(os.path.join(ckpt, "last_model", "model.state"))
    assert os.path.exists(os.path.join(ckpt, "epoch_2"))
    # eval metrics are sane
    eer, min_dcf, thr = trainer.evaluate()
    assert 0.0 <= eer <= 1.0 and 0.0 <= min_dcf <= 1.0

    # auto-resume: a fresh trainer picks up epoch 2 and continues to 3
    trainer2 = Trainer(configs=_configs(workdir, max_epoch=3),
                       data_augment_configs=AUG)
    trainer2.train(save_model_path=save_dir,
                   log_dir=str(tmp_path / "log2"), do_eval=False)
    assert os.path.exists(os.path.join(ckpt, "epoch_3"))
    assert int(trainer2.state.step) > 0
    # the resumed run must continue the (seed, epoch) sample stream, not
    # replay epoch 0's batch order: the sampler was fast-forwarded to
    # last_epoch=2 before its single epoch (which advanced it to 3)
    assert trainer2.train_loader.batch_sampler.epoch == 3
    from voiceprintrecognition_paddlepaddle_tpu.data_utils.pk_sampler import \
        BatchSampler
    s0 = BatchSampler(trainer2.train_dataset, batch_size=8, seed=1000)
    s2 = BatchSampler(trainer2.train_dataset, batch_size=8, seed=1000)
    s2.set_epoch(2)
    assert list(s0) != list(s2)


def test_feature_mode_train_step_uses_length_masks(workdir, tmp_path):
    """Regression (round-1 weak #2): precomputed-``.npy`` training batches
    are bucket-padded; the train step must mask pooled statistics with the
    frame ratios instead of pooling over padding. Before the fix, lengths
    were silently dropped in feature mode, so the loss was invariant to
    the padding ratio — assert it no longer is."""
    import jax.numpy as jnp
    import jax

    trainer = Trainer(configs=_configs(workdir, max_epoch=1))
    trainer._Trainer__setup_dataloader(is_train=True)
    trainer._Trainer__setup_model(input_size=40, is_train=True)
    step_fn = trainer._build_train_step()

    rng = np.random.RandomState(0)
    feats = np.zeros((8, 128, 40), np.float32)
    feats[:, :64] = rng.randn(8, 64, 40)  # valid half, zero-padded half
    labels = jnp.asarray(rng.randint(0, 4, size=8))
    key = jax.random.PRNGKey(0)

    # real buffer copies: the step donates its state argument
    state0 = jax.tree.map(jnp.copy, trainer.state)
    _, m_masked = step_fn(state0, jnp.asarray(feats),
                          jnp.full((8,), 0.5, jnp.float32), labels,
                          np.float32(0.2), key, from_waveforms=False)
    state1 = jax.tree.map(jnp.copy, trainer.state)
    _, m_unmasked = step_fn(state1, jnp.asarray(feats),
                            jnp.ones((8,), jnp.float32), labels,
                            np.float32(0.2), key, from_waveforms=False)
    assert np.isfinite(float(m_masked["loss"]))
    assert abs(float(m_masked["loss"]) - float(m_unmasked["loss"])) > 1e-6


def test_extract_features_then_train(workdir, tmp_path):
    cfg = _configs(workdir, max_epoch=1)
    trainer = Trainer(configs=cfg)
    trainer.extract_features(save_dir=str(tmp_path / "features"),
                             max_duration=100)
    feats_list = str(workdir / "train_list_features.txt")
    assert os.path.exists(feats_list)
    first = open(feats_list, encoding="utf-8").readline().split("\t")[0]
    arr = np.load(first)
    assert arr.ndim == 2 and arr.shape[1] == 40
    # exact (untrimmed-pad-free) frame count for a 1.2 s clip
    assert arr.shape[0] == 1 + (int(1.2 * SR) - 400) // 160

    # train from the precomputed features
    cfg2 = _configs(workdir, max_epoch=1)
    cfg2["dataset_conf"]["train_list"] = feats_list
    trainer2 = Trainer(configs=cfg2)
    trainer2.train(save_model_path=str(tmp_path / "m2"),
                   log_dir=str(tmp_path / "log3"), do_eval=False)
    assert int(trainer2.state.step) > 0


def test_gradient_accumulation(workdir, tmp_path):
    """``train_conf.accum_steps`` wraps the optimizer in optax.MultiSteps:
    parameters only move every k-th microbatch (effective batch = k x
    batch_size), the MultiSteps opt_state round-trips through the
    checkpoint, and auto-resume continues."""
    import jax
    import numpy as np

    cfg = _configs(workdir, max_epoch=1)
    cfg["train_conf"]["accum_steps"] = 2
    save_dir = str(tmp_path / "models")
    trainer = Trainer(configs=cfg, data_augment_configs=AUG)
    trainer.train(save_model_path=save_dir, log_dir=None, do_eval=False)
    assert trainer.accum_steps == 2
    p1 = jax.device_get(trainer.state.params)

    # resume with one more epoch: MultiSteps state deserializes
    cfg2 = _configs(workdir, max_epoch=2)
    cfg2["train_conf"]["accum_steps"] = 2
    trainer2 = Trainer(configs=cfg2, data_augment_configs=AUG)
    trainer2.train(save_model_path=save_dir, log_dir=None, do_eval=False)
    p2 = jax.device_get(trainer2.state.params)
    moved = jax.tree_util.tree_reduce(
        lambda acc, ab: acc + float(np.abs(ab).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, p1, p2), 0.0)
    assert moved > 0.0, "resumed accumulation epoch did not update params"


def test_eval_fast_path_failure_falls_back(workdir, tmp_path):
    """A Pallas eval path that explodes at first batch must not take the
    per-epoch eval down: the loader logs, disables it, and finishes on
    the XLA path with a valid EER."""
    cfg = _configs(workdir, max_epoch=1)
    t = Trainer(configs=cfg)
    save = str(tmp_path / "models_fb")
    t.train(save_model_path=save, log_dir=str(tmp_path / "log_fb"),
            do_eval=False)

    def boom_factory(variables, **kwargs):
        def boom(waves, ratios):
            raise RuntimeError("mosaic lowering failed")
        return boom

    t._maybe_fast_eval = boom_factory
    eer, min_dcf, thr = t.evaluate(
        resume_model=os.path.join(save, "TDNN_Fbank", "last_model"))
    assert 0.0 <= eer <= 1.0 and 0.0 <= min_dcf
