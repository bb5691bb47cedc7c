"""2-process data-parallel smoke test over the CPU Gloo backend.

Validates the real multi-host path — ``maybe_initialize_distributed`` →
global 2-device mesh (one per process) → rank-sharded sampler →
``make_array_from_process_local_data`` → jit-inserted gradient all-reduce
→ rank-0 checkpointing — without TPU pod hardware (the reference's
analogue is the manual ``paddle.distributed.launch`` run, README.md:229-231).
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy suite: excluded from the < 5-min fast tier

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")  # env var alone is unreliable

    sys.path.insert(0, {repo!r})
    from voiceprintrecognition_paddlepaddle_tpu.trainer import Trainer

    configs = {{
        "dataset_conf": {{
            "dataset": {{"min_duration": 0.1, "max_duration": 0.5,
                         "sample_rate": 16000}},
            "sampler": {{"batch_size": 4, "shuffle": True,
                         "drop_last": True}},
            "dataLoader": {{"num_workers": 0}},
            "eval_conf": {{"batch_size": 2, "max_duration": 1}},
            "train_list": {train_list!r},
        }},
        "preprocess_conf": {{"feature_method": "Fbank",
                             "method_args": {{"sr": 16000, "n_mels": 40}}}},
        "model_conf": {{"model": "TDNN",
                        "model_args": {{"embd_dim": 16, "channels": 16,
                                        "pooling_type": "TSP"}},
                        "classifier": {{"classifier_type": "Cosine",
                                        "num_speakers": 4,
                                        "num_blocks": 0}}}},
        "loss_conf": {{"loss": "AAMLoss",
                       "loss_args": {{"margin": 0.2, "scale": 32}}}},
        "optimizer_conf": {{"optimizer": "Adam",
                            "optimizer_args": {{}},
                            "scheduler": "WarmupCosineSchedulerLR",
                            "scheduler_args": {{"learning_rate": 0.01,
                                                "min_lr": 1.0e-5,
                                                "warmup_epoch": 1}}}},
        "train_conf": {{"enable_amp": False, "max_epoch": 1,
                        "log_interval": 1}},
    }}
    trainer = Trainer(configs=configs, use_gpu=False)
    trainer.train(save_model_path={save!r}, log_dir=None, do_eval=False)
    assert jax.process_count() == 2, jax.process_count()
    leaves = jax.tree.leaves(jax.device_get(trainer.state.params))
    checksum = sum(float(abs(l).sum()) for l in leaves)
    steps = int(trainer.state.step)
    print(f"RESULT rank={{jax.process_index()}} steps={{steps}} "
          f"checksum={{checksum:.8f}}", flush=True)
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    import wave as wave_mod
    root = tmp_path_factory.mktemp("mh")
    rng = np.random.RandomState(0)
    sr = 16000
    lines = []
    for i in range(16):
        p = root / f"u{i}.wav"
        t = np.arange(sr // 2) / sr
        sig = 0.3 * np.sin(2 * np.pi * (150 + 50 * (i % 4)) * t) \
            + 0.02 * rng.randn(len(t))
        with wave_mod.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes((np.clip(sig, -1, 1) * 32767)
                          .astype("<i2").tobytes())
        lines.append(f"{p}\t{i % 4}")
    lst = root / "train.txt"
    lst.write_text("\n".join(lines) + "\n", encoding="utf-8")
    return str(lst), str(root / "models")


def test_two_process_training_agrees(dataset, tmp_path):
    train_list, save = dataset
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER.format(repo=REPO, train_list=train_list,
                                    save=save), encoding="utf-8")
    coordinator = f"127.0.0.1:{_free_port()}"
    procs = []
    for rank in range(2):
        env = dict(os.environ, VPR_COORDINATOR=coordinator,
                   VPR_NUM_PROCESSES="2", VPR_PROCESS_ID=str(rank),
                   JAX_PLATFORMS="cpu")
        env.pop("XLA_FLAGS", None)  # one CPU device per process
        procs.append(subprocess.Popen(
            [sys.executable, str(worker)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    results = {}
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][0]
        parts = dict(kv.split("=") for kv in line.split()[1:])
        results[int(parts["rank"])] = (int(parts["steps"]),
                                       float(parts["checksum"]))
    assert set(results) == {0, 1}
    # dataset is sharded: 16 items / (batch 4 × 2 replicas) = 2 steps each
    assert results[0][0] == results[1][0] == 2
    # replicated params identical after the jit-inserted all-reduce
    assert results[0][1] == pytest.approx(results[1][1], rel=1e-6)
    # rank 0 checkpointed
    assert os.path.isdir(os.path.join(save, "TDNN_Fbank", "last_model"))


EVAL_WORKER = textwrap.dedent("""
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, {repo!r})
    from voiceprintrecognition_paddlepaddle_tpu.trainer import Trainer

    configs = {{
        "dataset_conf": {{
            "dataset": {{"min_duration": 0.1, "max_duration": 0.5,
                         "sample_rate": 16000}},
            "sampler": {{"batch_size": 4}},
            "dataLoader": {{"num_workers": 0}},
            "eval_conf": {{"batch_size": 2, "max_duration": 1}},
            "train_list": {train_list!r},
            "enroll_list": {train_list!r},
            "trials_list": {train_list!r},
        }},
        "preprocess_conf": {{"feature_method": "Fbank",
                             "method_args": {{"sr": 16000, "n_mels": 40}}}},
        "model_conf": {{"model": "TDNN",
                        "model_args": {{"embd_dim": 16, "channels": 16,
                                        "pooling_type": "TSP"}},
                        "classifier": {{"classifier_type": "Cosine",
                                        "num_speakers": 4,
                                        "num_blocks": 0}}}},
        "loss_conf": {{"loss": "AAMLoss"}},
        "optimizer_conf": {{"optimizer": "Adam",
                            "scheduler": "WarmupCosineSchedulerLR",
                            "scheduler_args": {{"learning_rate": 0.01}}}},
        "train_conf": {{"max_epoch": 1, "log_interval": 1}},
    }}
    trainer = Trainer(configs=configs, use_gpu=False)
    eer, min_dcf, thr = trainer.evaluate()
    print(f"EVAL rank={{jax.process_index()}} world={{jax.process_count()}} "
          f"eer={{eer:.6f}} dcf={{min_dcf:.6f}}", flush=True)
""")


def _run_eval_workers(tmp_path, train_list, n_procs, local_devices=1):
    worker = tmp_path / f"eval_worker_{n_procs}_{local_devices}.py"
    worker.write_text(EVAL_WORKER.format(repo=REPO, train_list=train_list),
                      encoding="utf-8")
    envs = []
    if n_procs == 1:
        envs.append(dict(os.environ, JAX_PLATFORMS="cpu"))
    else:
        coordinator = f"127.0.0.1:{_free_port()}"
        for rank in range(n_procs):
            envs.append(dict(os.environ, VPR_COORDINATOR=coordinator,
                             VPR_NUM_PROCESSES=str(n_procs),
                             VPR_PROCESS_ID=str(rank), JAX_PLATFORMS="cpu"))
    for env in envs:
        if local_devices > 1:
            env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                                f"{local_devices}")
        else:
            env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen([sys.executable, str(worker)], env=env,
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for env in envs]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    results = []
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"eval worker failed:\n{out[-3000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("EVAL")][0]
        parts = dict(kv.split("=") for kv in line.split()[1:])
        results.append((float(parts["eer"]), float(parts["dcf"])))
    return results


def test_two_process_eval_matches_single_process(dataset, tmp_path):
    """VERDICT round-2 weak #7: multi-process eval must use every
    process (rank-sharded embedding + allgather), and the EER must be
    identical to the single-process result."""
    train_list, _ = dataset
    (single,) = _run_eval_workers(tmp_path, train_list, 1)
    double = _run_eval_workers(tmp_path, train_list, 2)
    # both ranks computed (and agree on) the full-list EER
    assert double[0] == pytest.approx(double[1], abs=1e-9)
    assert double[0][0] == pytest.approx(single[0], abs=1e-6)
    assert double[0][1] == pytest.approx(single[1], abs=1e-6)


def test_two_process_eval_uses_all_local_devices(dataset, tmp_path):
    """ROADMAP round-3 item: multi-process eval embeds over a HOST-LOCAL
    mesh (all of each process's devices, not just device 0). 2 processes
    × 2 local CPU devices each must reproduce the single-process EER —
    proving the local-mesh SPMD path (batch padding to the local device
    count, replicated weights, no cross-process collectives in jit)."""
    train_list, _ = dataset
    (single,) = _run_eval_workers(tmp_path, train_list, 1)
    double = _run_eval_workers(tmp_path, train_list, 2, local_devices=2)
    assert double[0] == pytest.approx(double[1], abs=1e-9)
    assert double[0][0] == pytest.approx(single[0], abs=1e-6)
    assert double[0][1] == pytest.approx(single[1], abs=1e-6)
