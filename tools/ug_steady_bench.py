"""Steady-state bench for the trunk kernel (VERDICT r4 #5 artifact).

`tools/trunk_compile_probe.py` measures an honest fresh-cache compile,
but its steady-state phase wraps the kernel in a second (fori_loop)
XLA program — on this lab's tunnel that is a second 30+-min remote
compile and blows any sane budget. This tool compiles ONLY the chained
steady-state program, against the repo's persistent cache so the cost
is paid once, and prints ms/batch at b256 x 3 s, u=16, uniform lengths.

This is the tool that KILLED the uniform-gates variant: with
VPR_TRUNK_UNIFORM_GATES=1 at its measurement commit it recorded
95.26 ms/batch-256 steady state (fresh Mosaic compile 1100-1857 s)
vs ~4.6 ms for the matmul-gating kernel — the variant was deleted in
the same commit that introduced this tool. To reproduce the losing
side, copy this file into the deletion commit's PARENT tree (where
the variant and its env flag still exist) and run both sides there.
On HEAD it simply benches the production trunk kernel.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
sys.path.insert(0, os.path.dirname(__file__))
from _bench import cache_dir
jax.config.update("jax_compilation_cache_dir", cache_dir())
import jax.numpy as jnp
import numpy as np


def main(seconds=3.0, batch=256, u=None, iters=10):
    from voiceprintrecognition_paddlepaddle_tpu.models import CAMPPlus
    from voiceprintrecognition_paddlepaddle_tpu.models import (
        pallas_campplus as pc)
    from voiceprintrecognition_paddlepaddle_tpu.models.campplus import FCM

    sr = 16000
    model = CAMPPlus(input_size=80, embd_dim=192, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    n_frames = (int(seconds * sr) - 400) // 160 + 1
    feats = jnp.asarray(rng.randn(batch, n_frames, 80).astype(np.float32))

    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), feats[:1, :298], train=False))()
    packed = jax.jit(lambda v: pc.default_pack(v, pc.trunk_plan()))(variables)
    jax.block_until_ready(packed)

    t_raw = feats.shape[1]
    t_valid, t_pad, u_auto, n_segs = pc.trunk_geometry(t_raw, u)
    u = u or u_auto
    print(f"b={batch} t_pad={t_pad} u={u}", flush=True)

    fcm = FCM(dtype=model.dtype)
    fcm_vars = {"params": variables["params"]["FCM_0"],
                "batch_stats": variables["batch_stats"]["FCM_0"]}
    fcm_out = jax.jit(lambda f: fcm.apply(fcm_vars, f, train=False))(feats)
    jax.block_until_ready(fcm_out)

    b_pad = pc._round_up(batch, u)
    if b_pad != batch:
        fcm_out = jnp.concatenate(
            [fcm_out, jnp.zeros((b_pad - batch,) + fcm_out.shape[1:],
                                fcm_out.dtype)])
    tv = [t_valid] * b_pad
    pt, msel, ssel, mask = (jnp.asarray(m) for m in pc._pool_matrices(
        tv, t_pad, u, n_segs))
    corr = jnp.asarray([t / max(t - 1, 1) for t in tv], jnp.float32) ** 0.5

    @jax.jit
    def chained(x):
        def body(i, c):
            xx, _ = c
            out = pc.trunk_stats_from_parts(packed, xx, pt, msel, ssel,
                                            mask, corr, t_pad, u)
            pert = jnp.sum(out).astype(jnp.float32) * 1e-30
            return ((xx * (1.0 + pert)).astype(xx.dtype), out)
        return jax.lax.fori_loop(
            0, iters, body,
            (x, jnp.zeros((b_pad, 1024), jnp.float32)))

    t0 = time.perf_counter()
    r = chained(fcm_out)
    jax.block_until_ready(r)
    print(f"first call (compile + run): {time.perf_counter() - t0:.1f} s",
          flush=True)
    t0 = time.perf_counter()
    r = chained(fcm_out)
    float(np.asarray(jnp.sum(r[1][:1])))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"steady state (device-serial): {dt:.2f} ms/batch-{batch} "
          f"({batch / dt * 1000:.0f} utt/s)", flush=True)
    out = np.asarray(r[1][:batch], np.float32)
    assert np.isfinite(out).all(), "non-finite pooled stats"


if __name__ == "__main__":
    a = sys.argv[1:]
    main(float(a[0]) if a else 3.0,
         int(a[1]) if len(a) > 1 else 256,
         int(a[2]) if len(a) > 2 else None,
         int(a[3]) if len(a) > 3 else 10)
