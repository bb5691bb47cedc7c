"""Device benchmark: XLA FCM vs the Pallas FCM kernel.

Chained device-serial timing (one jitted fori_loop with a data
dependency; see BENCH methodology in bench.py). Run on the TPU:

    python tools/fcm_kernel_bench.py [batch] [seconds] [iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

from voiceprintrecognition_paddlepaddle_tpu.models.campplus import FCM
from voiceprintrecognition_paddlepaddle_tpu.models.pallas_fcm import (
    fcm_pallas, pack_fcm)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    secs = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    t = (int(secs * 16000) - 240) // 160 - 1
    print(f"batch={batch} T={t} iters={iters} dev={jax.devices()[0]}")

    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(batch, t, 80).astype(np.float32))
    model = FCM(dtype=jnp.bfloat16)
    v = model.init(jax.random.PRNGKey(0), feats[:1], train=False)
    vv = {"params": {"FCM_0": v["params"]},
          "batch_stats": {"FCM_0": v["batch_stats"]}}
    packed = jax.jit(pack_fcm)(vv)
    jax.block_until_ready(packed)

    @jax.jit
    def xla_chain(x):
        def body(_, acc):
            y = model.apply(v, x + acc[None, None, None], train=False)
            return y.astype(jnp.float32).mean()
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    @jax.jit
    def pal_chain(x):
        def body(_, acc):
            y = fcm_pallas(None, x + acc[None, None, None], packed=packed)
            return y.astype(jnp.float32).mean()
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    for name, fn in (("xla", xla_chain), ("pallas", pal_chain)):
        t0 = time.perf_counter()
        r = fn(feats)
        jax.block_until_ready(r)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = fn(feats)
        jax.block_until_ready(r)
        wall = time.perf_counter() - t0
        per = wall / iters * 1000
        print(f"{name:7s} compile+first {compile_s:7.2f}s   "
              f"{per:7.3f} ms/call  ({batch / per * 1000:,.0f} utt/s)")

    # numerics on device
    ref = model.apply(v, feats[:8], train=False).astype(jnp.float32)
    got = fcm_pallas(None, feats[:8], packed=packed)
    ref, got = np.asarray(ref), np.asarray(got)
    cos = float((ref * got).sum() / (np.linalg.norm(ref)
                                     * np.linalg.norm(got)))
    print(f"device parity: maxabs {np.abs(ref - got).max():.4f} cos {cos:.6f}")


if __name__ == "__main__":
    main()
