"""Compile-time + steady-state probe for the CAM++ trunk kernel variants.

Measures, on the real chip, (a) wall-clock compile time of the trunk
kernel at a given clip length / u, with a throwaway compilation cache so
the number is honest, and (b) steady-state ms/batch. This is the artifact
behind the looped-variant design decision (VERDICT round-2 next #1:
compile < 60 s for a 20 s bucket).

Usage: python tools/trunk_compile_probe.py SECONDS [BATCH] [U]
       VPR_TRUNK_VARIANT=unrolled python tools/trunk_compile_probe.py ...
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", tempfile.mkdtemp())


def main(seconds=20.0, batch=16, u=None):
    from voiceprintrecognition_paddlepaddle_tpu.models import CAMPPlus
    from voiceprintrecognition_paddlepaddle_tpu.models import pallas_campplus as pc

    sr = 16000
    model = CAMPPlus(input_size=80, embd_dim=192, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    n_frames = (int(seconds * sr) - 400) // 160 + 1
    feats = jnp.asarray(rng.randn(batch, n_frames, 80).astype(np.float32))

    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), feats[:1, :298], train=False))()
    packed = jax.jit(lambda v: pc.default_pack(v, pc.trunk_plan()))(variables)
    jax.block_until_ready(packed)

    t_raw = feats.shape[1]
    t_valid, t_pad, u_auto, n_segs = pc.trunk_geometry(t_raw, u)
    u = u or u_auto
    print(f"variant={pc._VARIANT} seconds={seconds} batch={batch} "
          f"t_raw={t_raw} t_pad={t_pad} u={u} rows/step={u * t_pad}",
          flush=True)

    from voiceprintrecognition_paddlepaddle_tpu.models.campplus import FCM
    fcm = FCM(dtype=model.dtype)
    fcm_vars = {"params": variables["params"]["FCM_0"],
                "batch_stats": variables["batch_stats"]["FCM_0"]}
    fcm_out = jax.jit(
        lambda f: fcm.apply(fcm_vars, f, train=False))(feats)
    jax.block_until_ready(fcm_out)

    t0 = time.perf_counter()
    out = pc.trunk_stats_pallas(variables, fcm_out, packed=packed, u=u)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    print(f"first call (compile + run): {compile_s:.1f} s", flush=True)

    # steady state with DEVICE-RESIDENT pooling matrices (the per-call
    # rebuild+upload is ~3.5 MB — a ~58 ms artifact of this lab's
    # 60 MB/s tunneled host link, irrelevant on a real TPU VM and
    # amortised inside jitted callers like bench.py), chained so async
    # dispatch cannot inflate the number
    import math as _math
    b_pad = pc._round_up(batch, u)
    if b_pad != batch:
        fcm_out = jnp.concatenate(
            [fcm_out, jnp.zeros((b_pad - batch,) + fcm_out.shape[1:],
                                fcm_out.dtype)])
    tv = [t_valid] * b_pad
    pt, msel, ssel, mask = (jnp.asarray(m) for m in pc._pool_matrices(
        tv, t_pad, u, n_segs))
    corr = jnp.asarray([t / max(t - 1, 1) for t in tv], jnp.float32) ** 0.5
    iters = 10

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

    r = chained(fcm_out)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = chained(fcm_out)
    float(np.asarray(jnp.sum(r[1][:1])))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"steady state (device-serial): {dt:.2f} ms/batch-{batch} "
          f"({batch / dt * 1000:.0f} utt/s)", flush=True)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(float(a[0]) if a else 20.0,
         int(a[1]) if len(a) > 1 else 16,
         int(a[2]) if len(a) > 2 else None)
