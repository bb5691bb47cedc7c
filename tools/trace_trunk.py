"""Capture + summarise a jax.profiler device trace of the trunk kernel.

Usage: python tools/trace_trunk.py [SECONDS] [BATCH] [U] [OUTDIR]
Prints the top device ops by total duration from the captured trace.
"""

import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def main(seconds=3.0, batch=256, u=16, outdir=None):
    from voiceprintrecognition_paddlepaddle_tpu.models import CAMPPlus
    from voiceprintrecognition_paddlepaddle_tpu.models import \
        pallas_campplus as pc
    from voiceprintrecognition_paddlepaddle_tpu.models.campplus import FCM

    outdir = outdir or tempfile.mkdtemp(prefix="trace_trunk_")
    sr = 16000
    model = CAMPPlus(input_size=80, embd_dim=192, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    n_frames = (int(seconds * sr) - 400) // 160 + 1
    feats = jnp.asarray(rng.randn(batch, n_frames, 80).astype(np.float32))
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), feats[:1, :298], train=False))()
    packed = jax.jit(lambda v: pc.default_pack(v, pc.trunk_plan()))(variables)
    fcm = FCM(dtype=model.dtype)
    fcm_out = jax.jit(lambda f: fcm.apply(
        {"params": variables["params"]["FCM_0"],
         "batch_stats": variables["batch_stats"]["FCM_0"]},
        f, train=False))(feats)
    jax.block_until_ready((packed, fcm_out))

    t_valid, t_pad, _, n_segs = pc.trunk_geometry(n_frames)
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
            0, 5, body, (x, jnp.zeros((b_pad, 1024), jnp.float32)))

    r = chained(fcm_out)
    jax.block_until_ready(r)
    print(f"warm; capturing trace to {outdir}", flush=True)
    with jax.profiler.trace(outdir):
        r = chained(fcm_out)
        jax.block_until_ready(r)

    # summarise device ops from the trace
    paths = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace under {outdir}"
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    durs = defaultdict(float)
    counts = defaultdict(int)
    pid_names = {}
    outer = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pname = pid_names.get(ev.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname:
            continue
        name = ev["name"]
        if name.startswith("jit_"):
            # the outermost program event spans (and double-counts) every
            # op inside it: it IS the per-call device total
            outer += ev.get("dur", 0) / 1e3
            continue
        durs[name] += ev.get("dur", 0) / 1e3
        counts[name] += 1
    print(f"device total (outer jit event): {outer:.2f} ms over 5 iters "
          f"({outer / 5:.2f} ms/iter)")
    print("per-op (the `while` row spans the chained loop body):")
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {d:9.3f} ms  x{counts[name]:<4d} {name[:90]}")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(float(a[0]) if a else 3.0,
         int(a[1]) if len(a) > 1 else 256,
         int(a[2]) if len(a) > 2 else 16,
         a[3] if len(a) > 3 else None)
