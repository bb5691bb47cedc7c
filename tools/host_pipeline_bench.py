"""Host data-pipeline benchmark: can the loader feed the device at device
rate? (VERDICT round-2 weak #2.)

Stages measured over a synthetic-but-real on-disk wav corpus:

1. ``host``      — Dataset + DataLoader sustained data/s (decode, speed
                   perturb, crop, collate), no device involved;
2. ``transfer``  — host→device bandwidth for the int16 batches this
                   pipeline ships (isolates the tunneled-link bound of
                   this lab from the host pipeline itself);
3. ``e2e``       — sustained data/s of the real ``Trainer`` epoch loop on
                   the chip (only with --e2e; needs the TPU).

Usage:
    python tools/host_pipeline_bench.py --wavs 10000 [--workers 8]
        [--batch 64] [--e2e] [--dir /tmp/vpr_pipe_bench]
"""

import argparse
import json
import os
import sys
import time
import wave as wave_mod

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

SR = 16000


def make_corpus(root, n_wavs, seconds_lo=2.0, seconds_hi=6.0, n_spk=100):
    """Synthetic wav corpus with realistic sizes; idempotent."""
    os.makedirs(root, exist_ok=True)
    list_path = os.path.join(root, "train_list.txt")
    marker = os.path.join(root, f".complete_{n_wavs}")
    if os.path.exists(marker):
        return list_path
    rng = np.random.RandomState(0)
    lines = []
    for i in range(n_wavs):
        spk = i % n_spk
        n = int(SR * rng.uniform(seconds_lo, seconds_hi))
        t = np.arange(n) / SR
        f0 = 100 + 3 * spk
        sig = (0.25 * np.sin(2 * np.pi * f0 * t + rng.rand())
               + 0.05 * rng.randn(n)).astype(np.float32)
        p = os.path.join(root, f"w{i:06d}.wav")
        with wave_mod.open(p, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(SR)
            w.writeframes(
                (np.clip(sig, -1, 1) * 32767).astype("<i2").tobytes())
        lines.append(f"{p}\t{spk}")
    with open(list_path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    open(marker, "w").close()
    return list_path


def bench_host_loader(list_path, batch, workers, n_spk=100, seconds=3,
                      max_batches=120):
    from voiceprintrecognition_paddlepaddle_tpu.data_utils.collate import \
        collate_waveforms
    from voiceprintrecognition_paddlepaddle_tpu.data_utils.loader import \
        DataLoader
    from voiceprintrecognition_paddlepaddle_tpu.data_utils.pk_sampler import \
        BatchSampler
    from voiceprintrecognition_paddlepaddle_tpu.data_utils.reader import \
        SpeakerDataset

    aug = {"speed": {"prob": 1.0}}  # the one host-side augment (worst case)
    ds = SpeakerDataset(data_list_path=list_path, mode="train",
                        aug_conf=aug, num_speakers=n_spk,
                        max_duration=seconds, min_duration=0.5)
    sampler = BatchSampler(ds, batch_size=batch, shuffle=True)
    loader = DataLoader(
        ds, sampler,
        lambda items: collate_waveforms(items, quantize_int16=True),
        num_workers=workers)

    n = 0
    # warm one batch (thread spin-up), then time
    it = iter(loader)
    next(it)
    t0 = time.perf_counter()
    for i, batch_data in enumerate(it):
        n += batch_data[0].shape[0]
        if i + 1 >= max_batches:
            break
    dt = time.perf_counter() - t0
    return n / dt


def bench_transfer(batch, seconds=3, iters=30):
    import jax
    import jax.numpy as jnp
    x = np.random.RandomState(0).randint(
        -2 ** 14, 2 ** 14, size=(batch, SR * seconds)).astype(np.int16)
    dev = jax.devices()[0]
    jax.device_put(x, dev).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.device_put(x, dev).block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return batch / dt, x.nbytes / dt / 1e9


def bench_e2e(list_path, batch, workers, n_spk=100, seconds=3):
    """Sustained data/s of the real Trainer train loop (1 epoch cap)."""
    from voiceprintrecognition_paddlepaddle_tpu.trainer import Trainer

    configs = {
        "dataset_conf": {
            "dataset": {"min_duration": 0.5, "max_duration": seconds,
                        "sample_rate": SR, "use_dB_normalization": True,
                        "target_dB": -20},
            "sampler": {"batch_size": batch, "shuffle": True,
                        "drop_last": True},
            "dataLoader": {"num_workers": workers},
            "eval_conf": {"batch_size": batch, "max_duration": 20},
            "train_list": list_path,
        },
        "preprocess_conf": {"feature_method": "Fbank",
                            "method_args": {"sr": SR, "n_mels": 80}},
        "model_conf": {"model": "EcapaTdnn",
                       "model_args": {"embd_dim": 192},
                       "classifier": {"classifier_type": "Cosine",
                                      "num_speakers": n_spk}},
        "loss_conf": {"loss": "AAMLoss",
                      "loss_args": {"margin": 0.2, "scale": 32}},
        "optimizer_conf": {"optimizer": "Adam",
                           "scheduler": "WarmupCosineSchedulerLR",
                           "scheduler_args": {"learning_rate": 0.001}},
        "train_conf": {"enable_amp": False, "max_epoch": 1,
                       "log_interval": 20},
    }
    aug = {"speed": {"prob": 1.0}, "volume": {"prob": 0.2},
           "noise": None, "reverb": None, "spec_aug": {"prob": 0.5}}
    trainer = Trainer(configs=configs, data_augment_configs=aug)
    t0 = time.perf_counter()
    trainer.train(save_model_path=None, log_dir=None, do_eval=False)
    dt = time.perf_counter() - t0
    steps = int(trainer.state.step)
    # steady-state excludes the compile-laden first windows (the first
    # log window contains the train-step jit compile; the second still
    # carries loader thread spin-up)
    speeds = sorted(trainer.train_window_speeds[2:])
    steady = speeds[len(speeds) // 2] if speeds else steps * batch / dt
    return steps * batch / dt, steady, steps


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--wavs", type=int, default=10000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--dir", default="/tmp/vpr_pipe_bench")
    ap.add_argument("--e2e", action="store_true")
    ap.add_argument("--transfer", action="store_true")
    args = ap.parse_args()

    print(f"corpus: {args.wavs} wavs in {args.dir} ...", flush=True)
    list_path = make_corpus(args.dir, args.wavs)

    out = {"wavs": args.wavs, "batch": args.batch, "workers": args.workers}
    host_dps = bench_host_loader(list_path, args.batch, args.workers)
    out["host_loader_data_per_sec"] = round(host_dps, 1)
    print(f"host loader: {host_dps:.0f} data/s "
          f"(workers={args.workers})", flush=True)

    if args.transfer or args.e2e:
        dps, gbps = bench_transfer(args.batch)
        out["transfer_data_per_sec"] = round(dps, 1)
        out["transfer_GBps"] = round(gbps, 3)
        print(f"host->device int16 transfer: {dps:.0f} data/s "
              f"({gbps:.2f} GB/s)", flush=True)

    if args.e2e:
        e2e_dps, steady, steps = bench_e2e(list_path, args.batch,
                                           args.workers)
        out["e2e_data_per_sec"] = round(e2e_dps, 1)
        out["e2e_steady_data_per_sec"] = round(steady, 1)
        out["e2e_steps"] = steps
        print(f"end-to-end train: {e2e_dps:.0f} data/s over {steps} steps "
              f"(steady-state median {steady:.0f} data/s)", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
