"""On-device validation + timing of the CAM++ Pallas inference path.

Runs on the real TPU (the pytest suite runs on the virtual CPU mesh and
covers the same kernels in interpret mode): compares the production
Pallas path (fused fbank + whole-trunk kernel) against the XLA path for
numerics, and reports device-serial chained timings for each segment.

Usage:  python tools/device_check.py [--batch 256] [--seconds 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def chained_ms(fn, x, iters=20):
    """Device-serial timing: each iteration's input depends on the
    previous output, so async dispatch cannot inflate the number."""
    @jax.jit
    def chained(x):
        def body(i, c):
            y = fn(c[0])
            pert = jnp.sum(y).astype(jnp.float32) * 1e-30
            return ((c[0] * (1.0 + pert)).astype(c[0].dtype), y)
        return jax.lax.fori_loop(0, iters, body, (x, fn(x)))

    r = chained(x)
    float(np.asarray(jnp.sum(r[1][:1]).astype(jnp.float32)))
    t0 = time.perf_counter()
    r = chained(x)
    float(np.asarray(jnp.sum(r[1][:1]).astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--seconds", type=float, default=3.0)
    args = ap.parse_args()

    from voiceprintrecognition_paddlepaddle_tpu.models import CAMPPlus
    from voiceprintrecognition_paddlepaddle_tpu.models.pallas_campplus import (
        make_campplus_embed_fn)
    from voiceprintrecognition_paddlepaddle_tpu.ops.features import (
        compute_feature)

    sr = 16000
    model = CAMPPlus(input_size=80, embd_dim=192, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    waves = jnp.asarray(
        rng.randn(args.batch, int(sr * args.seconds)).astype(np.float32)
        * 0.1)
    feats0 = compute_feature(waves[:2], "Fbank", sr=sr, n_mels=80)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), feats0, train=False))()
    embed = make_campplus_embed_fn(model, variables)

    fbank = lambda w: compute_feature(w, "Fbank", sr=sr, n_mels=80)
    full = lambda w: embed(fbank(w))
    full_xla = lambda w: model.apply(variables, fbank(w), train=False)

    # numerics first (cheap shapes)
    feats = fbank(waves[:16])
    ref = np.asarray(jax.jit(
        lambda f: model.apply(variables, f, train=False))(feats), np.float32)
    got = np.asarray(jax.jit(embed)(feats), np.float32)
    cos = ((ref * got).sum(-1) / np.linalg.norm(ref, axis=-1)
           / np.linalg.norm(got, axis=-1))
    print(f"pallas vs XLA embedding cos(min over {len(cos)}): {cos.min():.6f}")
    assert cos.min() > 0.999, "Pallas path numerics drifted"

    for name, fn in (("fbank front-end", fbank),
                     ("full pallas embed", full),
                     ("full XLA embed", full_xla)):
        ms = chained_ms(fn, waves)
        print(f"{name:24s} {ms:7.2f} ms  ({args.batch / ms * 1000:8.0f} utt/s)")

    # masked padded-batch path (what Predictor.predict_batch serves)
    from voiceprintrecognition_paddlepaddle_tpu.models.pallas_campplus import (
        make_campplus_masked_embed_fn)
    from voiceprintrecognition_paddlepaddle_tpu.ops.features import (
        AudioFeaturizer)
    feat = AudioFeaturizer("Fbank", {"sr": sr, "n_mels": 80})
    masked = make_campplus_masked_embed_fn(model, variables, feat)
    w = np.array(waves[:16])  # writable copy (np.asarray of a jax.Array
    # can return a read-only view)
    lens = rng.randint(int(0.4 * w.shape[1]), w.shape[1] + 1, size=16)
    ratios = (lens / w.shape[1]).astype(np.float32)
    for i, n in enumerate(lens):
        w[i, n:] = 0.0
    got = np.asarray(masked(w, ratios), np.float32)
    i = 0
    f1 = feat.featurize(jnp.asarray(w[i:i + 1, :int(lens[i])]))
    exact = np.asarray(model.apply(variables, f1, train=False),
                       np.float32)[0]
    c = ((exact * got[i]).sum() / np.linalg.norm(exact)
         / np.linalg.norm(got[i]))
    print(f"masked path vs exact-length embed: cos {c:.6f}")
    assert c > 0.999, "masked kernel path numerics drifted"


if __name__ == "__main__":
    main()
