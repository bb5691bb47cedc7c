"""Capture + summarise a device trace of the FULL production embed path:
wave -> fused fbank kernel -> FCM kernel -> trunk kernel -> head.

Usage: python tools/trace_embed.py [SECONDS] [BATCH] [ITERS] [OUTDIR]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
import numpy as np

from _trace_util import summarise


def main(seconds=3.0, batch=256, iters=5, outdir=None):
    from voiceprintrecognition_paddlepaddle_tpu.models import CAMPPlus
    from voiceprintrecognition_paddlepaddle_tpu.models.pallas_campplus \
        import make_campplus_embed_fn
    from voiceprintrecognition_paddlepaddle_tpu.ops.features import \
        compute_feature

    outdir = outdir or tempfile.mkdtemp(prefix="trace_embed_")
    sr = 16000
    model = CAMPPlus(input_size=80, embd_dim=192, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    waves = jnp.asarray(
        rng.randn(batch, int(seconds * sr)).astype(np.float32) * 0.1)
    feats0 = compute_feature(waves[:2], "Fbank", sr=sr, n_mels=80)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), feats0, train=False))()
    embed_trunk = make_campplus_embed_fn(model, variables)

    @jax.jit
    def chained(w):
        def body(i, carry):
            w2, _ = carry
            feats = compute_feature(w2, "Fbank", sr=sr, n_mels=80)
            emb = embed_trunk(feats)
            return (w2 * (1.0 + emb[0, 0].astype(jnp.float32) * 1e-12),
                    emb)
        _, emb = jax.lax.fori_loop(
            0, iters, body,
            (w, jnp.zeros((w.shape[0], 192), jnp.bfloat16)))
        return emb

    r = chained(waves)
    jax.block_until_ready(r)                       # compile + warm
    with jax.profiler.trace(outdir):
        r = chained(waves)
        jax.block_until_ready(r)
    print(f"trace in {outdir}")
    summarise(outdir, iters)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(float(a[0]) if a else 3.0,
         int(a[1]) if len(a) > 1 else 256,
         int(a[2]) if len(a) > 2 else 5,
         a[3] if len(a) > 3 else None)
