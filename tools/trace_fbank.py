"""Capture + summarise a jax.profiler device trace of the Fbank front-end
(`ops.features.compute_feature` -> fused folded-DFT Pallas kernel + CMN).

Usage: python tools/trace_fbank.py [SECONDS] [BATCH] [OUTDIR]
Prints total device ms/iter plus the top device ops, so the kernel's own
cost is separable from framing/CMN overhead.
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

ITERS = 5


def main(seconds=3.0, batch=256, outdir=None):
    from voiceprintrecognition_paddlepaddle_tpu.ops.features import (
        compute_feature)

    outdir = outdir or tempfile.mkdtemp(prefix="trace_fbank_")
    sr = 16000
    rng = np.random.RandomState(0)
    waves = jnp.asarray(
        rng.randn(batch, int(sr * seconds)).astype(np.float32) * 0.1)

    @jax.jit
    def chained(w):
        def body(i, c):
            ww, _ = c
            f = compute_feature(ww, "Fbank", sr=sr, n_mels=80)
            pert = jnp.sum(f[:, 0, 0]).astype(jnp.float32) * 1e-30
            return (ww * (1.0 + pert), f)
        t = (int(sr * seconds) - 400) // 160 + 1
        return jax.lax.fori_loop(
            0, ITERS, body, (w, jnp.zeros((batch, t, 80), jnp.float32)))

    r = chained(waves)
    jax.block_until_ready(r)
    print(f"warm; capturing trace to {outdir}", flush=True)
    with jax.profiler.trace(outdir):
        r = chained(waves)
        jax.block_until_ready(r)

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
    print(f"device total (outer jit event): {outer:.2f} ms over {ITERS} "
          f"iters ({outer / ITERS:.2f} ms/iter)")
    print("per-op (the `while` row spans the chained loop body):")
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {d:9.3f} ms  x{counts[name]:<4d} {name[:90]}")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(float(a[0]) if a else 3.0,
         int(a[1]) if len(a) > 1 else 256,
         a[2] if len(a) > 2 else None)
