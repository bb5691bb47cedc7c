"""Shared helper: summarise a captured jax.profiler device trace.

The outermost ``jit_*`` event spans (and would double-count) every op
inside it, so it is reported as the per-call device total; per-op rows
follow (the ``while`` row spans a chained loop body).
"""

import glob
import gzip
import json
import os
from collections import defaultdict


def summarise(outdir, iters, top=25):
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
            outer += ev.get("dur", 0) / 1e3
            continue
        durs[name] += ev.get("dur", 0) / 1e3
        counts[name] += 1
    print(f"device total (outer jit event): {outer:.2f} ms over {iters} "
          f"iters ({outer / iters:.2f} ms/iter)")
    print("per-op (the `while` row spans the chained loop body):")
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {d:9.3f} ms  x{counts[name]:<4d} {name[:110]}")
    return outer / iters, durs, counts
