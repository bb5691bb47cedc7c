"""Roofline accounting for the full train step (VERDICT r3 item 4).

Compiles ONE train step (Fbank + backbone + classifier + AAM + Adam, the
exact ``tools/train_bench.py`` step body), pulls XLA's cost analysis off
the compiled executable (flops + bytes accessed), measures the step on
device (chained fori_loop, device-serial), and prints where the step sits
against the chip's two roofs:

  HBM bound  = bytes accessed / HBM bandwidth
  MXU bound  = flops / bf16 peak

If measured time is within ~15% of max(bounds), the step is at the
hardware ceiling and further single-op fusion can't move it — only an
activation-traffic restructuring (fused multi-layer trunk with custom
VJP) could, which is the documented high-effort candidate.

Usage: python tools/roofline_train.py [model] [batch] [amp] [hbm_gbps]
v5e defaults: 819 GB/s HBM, 197 TFLOP/s bf16 (394 with sparsity, n/a).
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


def main(model_name="CAMPPlus", batch=256, amp=True,
         hbm_gbps=819.0, bf16_tflops=197.0):
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
    tx = optax.adam(1e-3)

    rng = np.random.RandomState(0)
    waves = jnp.asarray(rng.randn(batch, sr * seconds).astype(np.float32)
                        * 0.1)
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

    def one_step(params, stats, opt_state, waves, labels):
        feats = compute_feature(waves, "Fbank", sr=sr, n_mels=n_mels)

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
                {"backbone": new_bstats,
                 "classifier": stats["classifier"]}, new_opt, loss)

    # ONE un-looped step for the cost analysis (the fori_loop wrapper
    # hides per-op costs behind the while op)
    step = jax.jit(one_step)
    compiled = step.lower(params, stats, opt_state, waves, labels).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))
    hbm_bound_ms = bytes_acc / (hbm_gbps * 1e9) * 1e3
    mxu_bound_ms = flops / (bf16_tflops * 1e12) * 1e3

    # measured: chained fori_loop, device-serial
    import optax as _o  # noqa: F401

    @jax.jit
    def run(params, stats, opt_state):
        def body(i, carry):
            p, s, o, _ = carry
            return one_step(p, s, o, waves, labels)
        return jax.lax.fori_loop(0, ITERS, body,
                                 (params, stats, opt_state, jnp.float32(0)))

    out = run(params, stats, opt_state)
    float(np.asarray(out[3]))
    t0 = time.perf_counter()
    out = run(*out[:3])
    float(np.asarray(out[3]))
    dt = (time.perf_counter() - t0) / ITERS * 1e3

    roof = max(hbm_bound_ms, mxu_bound_ms)
    print(f"{model_name} b{batch} amp={amp}: measured {dt:.2f} ms/step")
    print(f"  XLA cost analysis: {flops/1e12:.3f} TFLOP, "
          f"{bytes_acc/1e9:.3f} GB accessed")
    print(f"  HBM roof ({hbm_gbps:.0f} GB/s): {hbm_bound_ms:.2f} ms   "
          f"MXU roof ({bf16_tflops:.0f} TF/s bf16): {mxu_bound_ms:.2f} ms")
    print(f"  binding roof: {'HBM' if hbm_bound_ms >= mxu_bound_ms else 'MXU'}"
          f" {roof:.2f} ms -> measured/roof = {dt/roof:.2f}x "
          f"({(dt-roof)/roof*100:.0f}% above)")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if a else "CAMPPlus",
         int(a[1]) if len(a) > 1 else 256,
         bool(int(a[2])) if len(a) > 2 else True,
         float(a[3]) if len(a) > 3 else 819.0)
