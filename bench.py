"""Benchmark: 16 kHz wav → on-device Fbank (Pallas) → CAM++ → 192-d
embedding, utterances/sec on one chip (the BASELINE.json north-star
metric), plus the honest apples-to-apples *training* throughput
(EcapaTdnn batch 64 fp32 — the exact configuration behind the reference's
~440–480 data/sec GPU log, reference README.md:354-360).

Methodology: ITERS iterations are chained *inside one jitted fori_loop*
(each iteration's input depends on the previous output / the optimizer
state carries), so the timing is strictly device-serial — async dispatch,
RPC pipelining, or runtime caching of identical executions cannot inflate
it. Synchronisation is a host transfer of a scalar derived from the result
(``block_until_ready`` can be a no-op over tunneled TPU transports).
Sanity bound: XLA cost analysis puts the embed program at 3.37 GFLOP and
~63 MB of HBM traffic per utterance — it is HBM-bandwidth-bound, so utt/s
cannot exceed (HBM GB/s) / 0.063.

Prints one JSON line. The primary metric stays the inference north star
(vs_baseline = value / 480, the reference's only throughput number); the
``train_*`` fields are the direct training comparison at identical batch
size and numerics.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: repeat runs (e.g. the driver) skip the
# multi-minute CAM++ compile
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

BATCH = 256
SECONDS = 3
SR = 16000
ITERS = 20
BASELINE_UTT_PER_SEC = 480.0


def train_throughput(model_name="EcapaTdnn", batch=64, amp=False,
                     iters=ITERS):
    """data/sec for the full train step (Fbank + backbone + classifier +
    AAM + Adam), chained device-serial like the embed benchmark."""
    import optax

    from voiceprintrecognition_paddlepaddle_tpu.loss import AAMLoss
    from voiceprintrecognition_paddlepaddle_tpu.models import MODELS
    from voiceprintrecognition_paddlepaddle_tpu.models.fc import (
        SpeakerIdentification)
    from voiceprintrecognition_paddlepaddle_tpu.ops.features import (
        compute_feature)

    sr, seconds, n_mels, n_spk = SR, SECONDS, 80, 2796
    dtype = jnp.bfloat16 if amp else None
    model = MODELS[model_name](input_size=n_mels, embd_dim=192, dtype=dtype)
    classifier = SpeakerIdentification(num_speakers=n_spk, dtype=dtype)
    criterion = AAMLoss(margin=0.2, scale=32)
    tx = optax.adam(1e-3)

    rng = np.random.RandomState(0)
    waves = jnp.asarray(rng.randn(batch, sr * seconds).astype(np.float32) * 0.1)
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
    return batch / dt


def main():
    from voiceprintrecognition_paddlepaddle_tpu.models import CAMPPlus
    from voiceprintrecognition_paddlepaddle_tpu.models.pallas_campplus import (
        make_campplus_embed_fn)
    from voiceprintrecognition_paddlepaddle_tpu.ops.features import (
        compute_feature)

    model = CAMPPlus(input_size=80, embd_dim=192, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    waves = jnp.asarray(rng.randn(BATCH, SR * SECONDS).astype(np.float32) * 0.1)

    feats0 = compute_feature(waves[:2], "Fbank", sr=SR, n_mels=80)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), feats0, train=False))()

    def make_chained(embed_trunk):
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

        return embed_chained

    def _sync(x):
        return float(np.asarray(jnp.sum(x[:1])))  # host transfer = real sync

    xla_trunk = lambda feats: model.apply(variables, feats, train=False)
    if jax.default_backend() == "tpu":
        # production inference path: fused fbank + FCM + trunk kernels.
        # Degrade GRADUALLY if a kernel fails on this part: first drop
        # the uniform-gate variant, then the FCM kernel, and only then
        # the whole Pallas path — one unsupported construct must not
        # forfeit the rest of the kernel stack
        import sys

        from voiceprintrecognition_paddlepaddle_tpu.models import (
            pallas_campplus as pc)
        attempts = [
            ("full kernel stack", {}),
            ("matmul CAM gates", {"_UNIFORM_GATES": False}),
            ("XLA FCM", {"_UNIFORM_GATES": False, "_FCM_PALLAS": False}),
        ]
        embed_chained = None
        for name, flags in attempts:
            for attr, val in flags.items():
                setattr(pc, attr, val)
            try:
                embed_chained = make_chained(
                    make_campplus_embed_fn(model, variables))
                _sync(embed_chained(waves))  # compile + warm
                if flags:
                    print(f"pallas path degraded to: {name}",
                          file=sys.stderr, flush=True)
                break
            except Exception as e:
                print(f"{name} failed ({e!r})", file=sys.stderr,
                      flush=True)
                embed_chained = None
        if embed_chained is None:
            embed_chained = make_chained(xla_trunk)
            _sync(embed_chained(waves))
    else:
        embed_chained = make_chained(xla_trunk)
        _sync(embed_chained(waves))  # compile + warm
    t0 = time.perf_counter()
    _sync(embed_chained(waves))
    elapsed = (time.perf_counter() - t0) / ITERS

    utt_per_sec = BATCH / elapsed

    # honest training comparison: same model/batch/numerics as the
    # reference's logged 440-480 data/sec (EcapaTdnn, batch 64, fp32)
    train_dps = train_throughput("EcapaTdnn", batch=64, amp=False)
    # the recommended production training config (CAM++, bf16 AMP, b256);
    # if the SDConv Pallas op fails on this part, measure the lax path
    try:
        campplus_dps = train_throughput("CAMPPlus", batch=256, amp=True)
    except Exception as e:
        import sys

        from voiceprintrecognition_paddlepaddle_tpu.models import campplus
        print(f"SDConv train path failed ({e!r}); lax fallback",
              file=sys.stderr, flush=True)
        campplus._SDCONV = "0"
        campplus_dps = train_throughput("CAMPPlus", batch=256, amp=True)

    print(json.dumps({
        "metric": "wav_to_campplus_embedding_throughput",
        "value": round(utt_per_sec, 2),
        "unit": "utt/s/chip",
        "vs_baseline": round(utt_per_sec / BASELINE_UTT_PER_SEC, 2),
        "train_metric": "ecapa_b64_fp32_train_throughput",
        "train_value": round(train_dps, 2),
        "train_unit": "data/s/chip",
        "train_vs_baseline": round(train_dps / BASELINE_UTT_PER_SEC, 2),
        "campplus_train_metric": "campplus_b256_bf16_train_throughput",
        "campplus_train_value": round(campplus_dps, 2),
        "campplus_train_unit": "data/s/chip",
    }))


if __name__ == "__main__":
    main()
