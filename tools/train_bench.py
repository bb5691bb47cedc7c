"""Training-throughput benchmark on the real chip: the full fused DP train
step (device augmentation-free synthetic batch + Fbank + backbone +
classifier + AAM loss + Adam) on synthetic data.

Methodology: ITERS optimizer steps run chained inside one jitted fori_loop
(params/opt-state carry), so the measurement is strictly device-serial and
immune to async-dispatch / RPC-pipelining artifacts.

The reference's comparable number is ~440-480 data/sec for EcapaTdnn batch
64 on its GPU (reference README.md:354-360).

Usage: python tools/train_bench.py [model] [batch] [amp]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

ITERS = 10


def main(model_name="EcapaTdnn", batch=64, amp=False, mu_dtype=None):
    import optax
    from voiceprintrecognition_paddlepaddle_tpu.loss import AAMLoss
    from voiceprintrecognition_paddlepaddle_tpu.models import MODELS
    from voiceprintrecognition_paddlepaddle_tpu.models.fc import (
        SpeakerIdentification)
    from voiceprintrecognition_paddlepaddle_tpu.ops.features import (
        compute_feature)

    sr, seconds, n_mels, n_spk = 16000, 3, 80, 2796
    dtype = jnp.bfloat16 if amp else None
    model = MODELS[model_name](input_size=n_mels, embd_dim=192, dtype=dtype)
    classifier = SpeakerIdentification(num_speakers=n_spk, dtype=dtype)
    criterion = AAMLoss(margin=0.2, scale=32)
    tx = optax.adam(1e-3, mu_dtype=mu_dtype)

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

    def one_step(params, stats, opt_state, waves, labels, loss_prev):
        # waves derive from the carried loss so featurization is NOT
        # loop-invariant (XLA LICM would hoist it and overstate data/sec)
        w = waves * (1.0 + loss_prev.astype(jnp.float32) * 1e-30)
        feats = compute_feature(w, "Fbank", sr=sr, n_mels=n_mels)

        def loss_fn(p):
            emb, mb = model.apply(
                {"params": p["backbone"], "batch_stats": stats["backbone"]},
                feats, train=True, mutable=["batch_stats"])
            out, _ = classifier.apply(
                {"params": p["classifier"],
                 "batch_stats": stats["classifier"]},
                emb.astype(jnp.float32), train=False, mutable=["batch_stats"])
            return criterion(out, labels, margin=jnp.float32(0.2)), \
                mb["batch_stats"]

        (loss, new_bstats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, {"backbone": new_bstats,
                            "classifier": stats["classifier"]}, new_opt, loss

    @jax.jit
    def run(params, stats, opt_state, waves, labels):
        def body(i, carry):
            params, stats, opt_state, loss_prev = carry
            return one_step(params, stats, opt_state, waves, labels,
                            loss_prev)
        return jax.lax.fori_loop(0, ITERS, body,
                                 (params, stats, opt_state, jnp.float32(0)))

    out = run(params, stats, opt_state, waves, labels)
    float(np.asarray(out[3]))  # compile + warm (host transfer = real sync)
    t0 = time.perf_counter()
    out = run(*out[:3], waves, labels)
    float(np.asarray(out[3]))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{model_name} batch={batch} amp={amp} mu_dtype={mu_dtype}: "
          f"{dt*1e3:.2f} ms/step, "
          f"{batch/dt:.0f} data/sec (reference GPU: ~440-480)")


if __name__ == "__main__":
    args = sys.argv[1:]
    main(args[0] if args else "EcapaTdnn",
         int(args[1]) if len(args) > 1 else 64,
         bool(int(args[2])) if len(args) > 2 else False,
         jnp.bfloat16 if len(args) > 3 and args[3] == "bf16mu" else None)
