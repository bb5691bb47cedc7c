"""Benchmark: 16 kHz wav → on-device Fbank (Pallas) → CAM++ → 192-d
embedding, utterances/sec on one chip (the BASELINE.json north-star
metric), plus the honest apples-to-apples *training* throughput
(EcapaTdnn batch 64 fp32 — the exact configuration behind the reference's
~440–480 data/sec GPU log, reference README.md:354-360) and the
recommended production training config (CAM++ bf16 AMP batch 256).

Methodology: ITERS iterations are chained *inside one jitted fori_loop*
(each iteration's input depends on the previous output / the optimizer
state carries), so the timing is strictly device-serial — async dispatch,
RPC pipelining, or runtime caching of identical executions cannot inflate
it. Synchronisation is a host transfer of a scalar derived from the result
(``block_until_ready`` can be a no-op over tunneled TPU transports).
Sanity bound: XLA cost analysis puts the embed program at 3.37 GFLOP and
~63 MB of HBM traffic per utterance — it is HBM-bandwidth-bound, so utt/s
cannot exceed (HBM GB/s) / 0.063.

Hang hardening (round 4): every phase runs in its OWN subprocess with a
hard wall-clock timeout, because a wedged device tunnel blocks the first
jax call forever and previously cost the whole round its number
(BENCH_r03: rc=124, parsed=null). The parent never touches jax; it
orchestrates child processes:

  probe          jax.devices() + a trivial jit          (dead-tunnel guard)
  embed          wav→embedding throughput, the kernel stack degraded
                 ACROSS fresh processes via env flags (no module mutation)
  train_ecapa    EcapaTdnn b64 fp32 full train step
  train_campplus CAM++ b256 bf16 full train step (falls back to lax convs)

Whatever completes is reported; whatever fails/times out lands in an
``errors`` field. The parent always prints exactly ONE JSON line on
stdout and exits 0, even with a dead chip.
"""

import json
import os
import subprocess
import sys
import time

BATCH = 256
SECONDS = 3
SR = 16000
ITERS = 20
BASELINE_UTT_PER_SEC = 480.0

# overall wall budget for the parent: stay well under any driver timeout
# so a slow phase degrades THIS benchmark instead of nulling the round
TOTAL_BUDGET_S = float(os.environ.get("VPR_BENCH_BUDGET", "2900"))
PROBE_TIMEOUT_S = 150.0
PHASE_TIMEOUT_S = 1100.0   # per phase attempt (first compile can be slow)
# the embed program's fresh remote compile is ~6 min on this lab's
# tunneled chip; give the first (full-stack) attempt more rope before
# falling back to pure XLA
EMBED_FIRST_TIMEOUT_S = 1500.0


def _setup_jax_cache():
    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


# --------------------------------------------------------------------------
# child phases — each runs in its own process (python bench.py --phase X)
# --------------------------------------------------------------------------

def phase_probe():
    """Prove the device answers at all before committing to long phases."""
    import jax
    import jax.numpy as jnp
    d = jax.devices()
    x = jax.jit(lambda a: a * 2 + 1)(jnp.arange(8.0))
    assert float(x[3]) == 7.0
    return {"backend": jax.default_backend(), "n_devices": len(d),
            "device": str(d[0])}


def phase_embed():
    """wav → Fbank → CAM++ → embedding, utt/s, device-serial chained.

    The Pallas kernel stack is selected by env flags set by the parent
    (VPR_BENCH_XLA / VPR_FBANK_PALLAS / VPR_FCM_PALLAS /
    VPR_TRUNK_VARIANT); a failed
    kernel never needs in-process state rollback because a degraded
    attempt is a fresh process.
    """
    _setup_jax_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from voiceprintrecognition_paddlepaddle_tpu.models import CAMPPlus
    from voiceprintrecognition_paddlepaddle_tpu.ops.features import (
        compute_feature)

    model = CAMPPlus(input_size=80, embd_dim=192, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    waves = jnp.asarray(
        rng.randn(BATCH, SR * SECONDS).astype(np.float32) * 0.1)

    feats0 = compute_feature(waves[:2], "Fbank", sr=SR, n_mels=80)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), feats0, train=False))()

    use_xla = (os.environ.get("VPR_BENCH_XLA") == "1"
               or jax.default_backend() != "tpu")
    if use_xla:
        embed_trunk = lambda feats: model.apply(variables, feats,
                                                train=False)
    else:
        from voiceprintrecognition_paddlepaddle_tpu.models.pallas_campplus \
            import make_campplus_embed_fn
        embed_trunk = make_campplus_embed_fn(model, variables)

    def embed_once(w):
        feats = compute_feature(w, "Fbank", sr=SR, n_mels=80)
        return embed_trunk(feats)

    @jax.jit
    def embed_chained(w):
        def body(i, carry):
            w2, _ = carry
            emb = embed_once(w2)
            # data dependency: next input derives from this output
            return (w2 * (1.0 + emb[0, 0].astype(jnp.float32) * 1e-12),
                    emb)

        _, emb = jax.lax.fori_loop(
            0, ITERS, body,
            (w, jnp.zeros((w.shape[0], 192), jnp.bfloat16)))
        return emb

    def _sync(x):
        return float(np.asarray(jnp.sum(x[:1])))  # host transfer = sync

    _sync(embed_chained(waves))  # compile + warm
    t0 = time.perf_counter()
    _sync(embed_chained(waves))
    elapsed = (time.perf_counter() - t0) / ITERS
    return {"utt_per_sec": BATCH / elapsed,
            "path": "xla" if use_xla else "pallas"}


def phase_train(model_name, batch, amp):
    """data/sec for the full train step (Fbank + backbone + classifier +
    AAM + Adam), chained device-serial like the embed benchmark."""
    _setup_jax_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from voiceprintrecognition_paddlepaddle_tpu.loss import AAMLoss
    from voiceprintrecognition_paddlepaddle_tpu.models import MODELS
    from voiceprintrecognition_paddlepaddle_tpu.models.fc import (
        SpeakerIdentification)
    from voiceprintrecognition_paddlepaddle_tpu.ops.features import (
        compute_feature)

    sr, seconds, n_mels, n_spk = SR, SECONDS, 80, 2796
    iters = ITERS
    dtype = jnp.bfloat16 if amp else None
    model = MODELS[model_name](input_size=n_mels, embd_dim=192, dtype=dtype)
    classifier = SpeakerIdentification(num_speakers=n_spk, dtype=dtype)
    criterion = AAMLoss(margin=0.2, scale=32)
    tx = optax.adam(1e-3)

    rng = np.random.RandomState(0)
    waves = jnp.asarray(
        rng.randn(batch, sr * seconds).astype(np.float32) * 0.1)
    labels = jnp.asarray(rng.randint(0, n_spk, size=batch))

    def init_fn():
        feats0 = compute_feature(waves[:2], "Fbank", sr=sr, n_mels=n_mels)
        v = model.init(jax.random.PRNGKey(0), feats0, train=True)
        c = classifier.init(jax.random.PRNGKey(1), jnp.zeros((2, 192)),
                            train=False)
        params = {"backbone": v["params"], "classifier": c["params"]}
        stats = {"backbone": v.get("batch_stats", {}),
                 "classifier": c.get("batch_stats", {})}
        return params, stats, tx.init(params)

    params, stats, opt_state = jax.jit(init_fn)()

    def one_step(params, stats, opt_state, loss_prev):
        # waves derive from the carried loss so the Fbank computation is
        # NOT loop-invariant: XLA's while-loop LICM would otherwise hoist
        # featurization out of the loop and overstate data/sec
        w = waves * (1.0 + loss_prev.astype(jnp.float32) * 1e-30)
        feats = compute_feature(w, "Fbank", sr=sr, n_mels=n_mels)

        def loss_fn(p):
            emb, mb = model.apply(
                {"params": p["backbone"], "batch_stats": stats["backbone"]},
                feats, train=True, mutable=["batch_stats"])
            out, _ = classifier.apply(
                {"params": p["classifier"],
                 "batch_stats": stats["classifier"]},
                emb.astype(jnp.float32), train=False,
                mutable=["batch_stats"])
            return criterion(out, labels, margin=jnp.float32(0.2)), \
                mb["batch_stats"]

        (loss, new_bstats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates),
                {"backbone": new_bstats, "classifier": stats["classifier"]},
                new_opt, loss)

    @jax.jit
    def run(params, stats, opt_state):
        def body(i, carry):
            params, stats, opt_state, loss_prev = carry
            return one_step(params, stats, opt_state, loss_prev)
        return jax.lax.fori_loop(0, iters, body,
                                 (params, stats, opt_state, jnp.float32(0)))

    out = run(params, stats, opt_state)
    float(np.asarray(out[3]))  # compile + warm
    t0 = time.perf_counter()
    out = run(*out[:3])
    float(np.asarray(out[3]))  # host transfer = real sync
    dt = (time.perf_counter() - t0) / iters
    return {"data_per_sec": batch / dt}


PHASES = {
    "probe": phase_probe,
    "embed": phase_embed,
    "train_ecapa": lambda: phase_train("EcapaTdnn", 64, False),
    "train_campplus": lambda: phase_train("CAMPPlus", 256, True),
}


# --------------------------------------------------------------------------
# parent orchestration
# --------------------------------------------------------------------------

def _run_phase(name, timeout, env_extra=None):
    """Run one phase in a fresh subprocess; return (result_dict, error_str).

    The child prints one JSON line on stdout; everything else (jax
    warnings, compile logs) goes to stderr and is passed through for
    diagnosability.
    """
    env = dict(os.environ)
    env.update(env_extra or {})
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--phase", name],
            stdout=subprocess.PIPE, stderr=sys.stderr,
            timeout=timeout, env=env)
    except subprocess.TimeoutExpired:
        return None, f"{name}: timeout after {timeout:.0f}s"
    dt = time.perf_counter() - t0
    if proc.returncode != 0:
        return None, f"{name}: exit code {proc.returncode}"
    try:
        line = proc.stdout.decode().strip().splitlines()[-1]
        result = json.loads(line)
    except (IndexError, ValueError) as e:
        return None, f"{name}: unparseable output ({e})"
    result["wall_s"] = round(dt, 1)
    return result, None


def main():
    deadline = time.monotonic() + TOTAL_BUDGET_S
    errors = []

    def remaining():
        return deadline - time.monotonic()

    def budget(want):
        return max(0.0, min(want, remaining()))

    print(f"bench: parent pid {os.getpid()}, budget {TOTAL_BUDGET_S:.0f}s",
          file=sys.stderr, flush=True)

    # two attempts: a cold axon plugin has been observed to stall backend
    # init past 120 s once and then answer in ~2 s on the retry — a
    # transient init stall must not null the whole benchmark
    probe, err = _run_phase("probe", budget(PROBE_TIMEOUT_S))
    if err and remaining() > PROBE_TIMEOUT_S + 60:
        errors.append(f"probe attempt 1: {err}")
        print("bench: probe retry after transient failure",
              file=sys.stderr, flush=True)
        probe, err = _run_phase("probe", budget(PROBE_TIMEOUT_S))
    if err:
        errors.append(err)
        print(f"bench: device probe FAILED ({err}); emitting error record",
              file=sys.stderr, flush=True)
        print(json.dumps({
            "metric": "wav_to_campplus_embedding_throughput",
            "value": 0.0, "unit": "utt/s/chip", "vs_baseline": 0.0,
            "errors": errors,
        }))
        return
    print(f"bench: probe ok {probe}", file=sys.stderr, flush=True)

    # embed: degrade the kernel stack across FRESH processes — one
    # unsupported construct must not forfeit the rest of the stack
    # NOTE the default stack at 3 s buckets is already fbank kernel +
    # XLA FCM (measured crossover at 1000 frames) + unrolled trunk with
    # matmul CAM gates (the reshape-gating variant was measured 20x
    # slower and deleted — ROADMAP "Measured decisions"), so the only
    # meaningful degradation left is dropping to pure XLA.
    # The looped-trunk rung trades ~2 ms/batch of step time for a ~25 s
    # fresh compile (vs ~6 min unrolled) — a far smaller window for this
    # lab's tunnel to wedge in, and a round-3 device-proven program.
    attempts = [
        ("full kernel stack", {}),
        ("looped trunk kernel", {"VPR_TRUNK_VARIANT": "looped"}),
        ("pure XLA", {"VPR_BENCH_XLA": "1", "VPR_FBANK_PALLAS": "0"}),
    ]
    embed = None
    for desc, flags in attempts:
        if remaining() < 120:
            errors.append(f"embed: budget exhausted before '{desc}'")
            break
        want = EMBED_FIRST_TIMEOUT_S if not flags else PHASE_TIMEOUT_S
        embed, err = _run_phase("embed", budget(want), flags)
        if embed is not None:
            if flags:
                msg = f"embed: degraded to '{desc}'"
                errors.append(msg)
                print(f"bench: {msg}", file=sys.stderr, flush=True)
            break
        errors.append(f"embed[{desc}]: {err}")
        print(f"bench: embed attempt '{desc}' failed: {err}",
              file=sys.stderr, flush=True)

    def _train_with_fallback(name):
        """One retry with the Pallas fbank kernel off — the kernel is the
        only Pallas construct in the train phases' feature path; one
        unsupported construct must not forfeit the train numbers."""
        if remaining() < 120:
            return None, "skipped: budget exhausted"
        result, err0 = _run_phase(name, budget(PHASE_TIMEOUT_S))
        if result is not None or remaining() < 120:
            return result, err0
        errors.append(f"{name}[fbank kernel]: {err0}")
        result, err0 = _run_phase(name, budget(PHASE_TIMEOUT_S),
                                  {"VPR_FBANK_PALLAS": "0"})
        if result is not None:
            errors.append(f"{name}: degraded to 'fbank kernel off'")
        return result, err0

    train, err = _train_with_fallback("train_ecapa")
    if train is None:
        errors.append(f"train_ecapa: {err}")

    ctrain, err = _train_with_fallback("train_campplus")
    if ctrain is None:
        errors.append(f"train_campplus: {err}")

    utt_per_sec = embed["utt_per_sec"] if embed else 0.0
    record = {
        "metric": "wav_to_campplus_embedding_throughput",
        "value": round(utt_per_sec, 2),
        "unit": "utt/s/chip",
        "vs_baseline": round(utt_per_sec / BASELINE_UTT_PER_SEC, 2),
        "train_metric": "ecapa_b64_fp32_train_throughput",
        "train_value": round(train["data_per_sec"], 2) if train else 0.0,
        "train_unit": "data/s/chip",
        "train_vs_baseline": round(
            train["data_per_sec"] / BASELINE_UTT_PER_SEC, 2) if train
        else 0.0,
        "campplus_train_metric": "campplus_b256_bf16_train_throughput",
        "campplus_train_value": round(ctrain["data_per_sec"], 2) if ctrain
        else 0.0,
        "campplus_train_unit": "data/s/chip",
    }
    if errors:
        record["errors"] = errors
    print(json.dumps(record))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--phase":
        name = sys.argv[2]
        result = PHASES[name]()
        print(json.dumps(result), flush=True)
    else:
        main()
