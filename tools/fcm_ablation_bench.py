"""Decompose the Pallas FCM kernel's device time: im2col copies vs matmuls.

The round-4 A/B (tools/fcm_kernel_bench.py, ROADMAP "FCM kernel") measured
the full kernel at 20.5 ms vs XLA's 6.0 ms at b256 x 3 s and attributed
the loss to "per-step im2col copies". This tool proves or refutes that
attribution with a device number: it times the SAME kernel with every
patch copy compiled out (``ablate_copies`` — matmuls read stale scratch,
numerics garbage, timing valid since MXU/VPU time is data-independent).

  copies cost  = full - no_copies
  matmul floor = no_copies  (matmuls + affines + masked stores)

If no_copies already exceeds ~5 ms, NO im2col-family kernel — even with
free copies — can meaningfully beat XLA's measured 6.0 ms at this bucket,
and the hot-path FCM item closes with this number. If no_copies is far
below, the copies are the target and a copy-free layout is worth building.

    python tools/fcm_ablation_bench.py [batch] [seconds] [iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
sys.path.insert(0, os.path.dirname(__file__))
from _bench import cache_dir, kaldi_frames
jax.config.update("jax_compilation_cache_dir", cache_dir())
import jax.numpy as jnp
import numpy as np

from voiceprintrecognition_paddlepaddle_tpu.models.campplus import FCM
from voiceprintrecognition_paddlepaddle_tpu.models.pallas_fcm import (
    _fcm_call, _round_up, pack_fcm)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    secs = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    t = kaldi_frames(secs * 16000)
    print(f"batch={batch} T={t} iters={iters} dev={jax.devices()[0]}")

    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(batch, t, 80).astype(np.float32))
    model = FCM(dtype=jnp.bfloat16)
    v = model.init(jax.random.PRNGKey(0), feats[:1], train=False)
    vv = {"params": {"FCM_0": v["params"]},
          "batch_stats": {"FCM_0": v["batch_stats"]}}
    packed = jax.jit(pack_fcm)(vv)
    jax.block_until_ready(packed)

    t2p = _round_up(-(-t // 2) + 1, 8)
    b = feats.shape[0]

    def s2d():
        x = jnp.pad(feats, ((0, 0), (0, 2 * t2p - t), (0, 0)))
        x = x.reshape(b, t2p, 2, 40, 2).transpose(0, 3, 1, 4, 2)
        return x.reshape(b, 40, t2p, 4).astype(jnp.bfloat16)

    x1 = jax.jit(s2d)()
    jax.block_until_ready(x1)

    def chain(ablate):
        @jax.jit
        def run(x1):
            def body(_, carry):
                x2, acc = carry
                y = _fcm_call(packed, x2, t=t, t2p=t2p, interpret=False,
                              ablate_copies=ablate)
                d = y[0, 0, 0].astype(jnp.float32)
                # NaN-proof data dependency: ablated matmuls read
                # uninitialised scratch, so route the dependency through
                # a predicate rather than arithmetic on the value
                bump = jnp.where(jnp.isfinite(d), d, 0.0) * 1e-12
                return (x2 * (1.0 + bump.astype(x2.dtype)), acc + bump)
            return jax.lax.fori_loop(0, iters, body, (x1, jnp.float32(0)))
        return run

    results = {}
    for name, ablate in (("full", False), ("no_copies", True)):
        run = chain(ablate)
        t0 = time.perf_counter()
        # sync timed regions by host transfer (see tools/_bench.py)
        float(np.asarray(run(x1)[1]))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(run(x1)[1]))
        per = (time.perf_counter() - t0) / iters * 1000
        results[name] = per
        print(f"{name:10s} compile+first {compile_s:7.2f}s   "
              f"{per:7.3f} ms/call")
    print(f"copies cost = {results['full'] - results['no_copies']:.3f} ms "
          f"({(results['full'] - results['no_copies']) / results['full'] * 100:.0f}% of kernel)")


if __name__ == "__main__":
    main()
