"""Capture + summarise a jax.profiler device trace of the full train step
(Fbank + backbone + classifier + AAM + Adam), the same program
``bench.py``/``tools/train_bench.py`` time.

Usage: python tools/trace_train.py [MODEL] [BATCH] [AMP(0/1)] [OUTDIR]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from _trace_util import summarise  # noqa: E402

ITERS = 5


def main(model_name="CAMPPlus", batch=256, amp=True, outdir=None):
    import optax

    from voiceprintrecognition_paddlepaddle_tpu.loss import AAMLoss
    from voiceprintrecognition_paddlepaddle_tpu.models import MODELS
    from voiceprintrecognition_paddlepaddle_tpu.models.fc import (
        SpeakerIdentification)
    from voiceprintrecognition_paddlepaddle_tpu.ops.features import (
        compute_feature)

    outdir = outdir or tempfile.mkdtemp(prefix="trace_train_")
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

    def one_step(params, stats, opt_state, loss_prev):
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
            return one_step(*carry)
        return jax.lax.fori_loop(0, ITERS, body,
                                 (params, stats, opt_state, jnp.float32(0)))

    out = run(params, stats, opt_state)
    jax.block_until_ready(out)
    print(f"warm; capturing trace to {outdir}", flush=True)
    with jax.profiler.trace(outdir):
        out = run(*out[:3])
        jax.block_until_ready(out)
    summarise(outdir, ITERS, top=40)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if a else "CAMPPlus",
         int(a[1]) if len(a) > 1 else 256,
         bool(int(a[2])) if len(a) > 2 else True,
         a[3] if len(a) > 3 else None)
