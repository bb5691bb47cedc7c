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
    paths = sorted(glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    assert paths, f"no trace under {outdir}"
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    # on a multi-device host every device pid carries its own jit_* span
    # for the same (data-parallel) program: summing across pids would
    # inflate totals N-fold, so accumulate per pid and report ONE device
    # (the pid with the largest jit total — the busiest replica)
    durs_by_pid = defaultdict(lambda: defaultdict(float))
    counts_by_pid = defaultdict(lambda: defaultdict(int))
    outer_by_pid = defaultdict(float)
    pid_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pid = ev.get("pid")
        pname = pid_names.get(pid, "")
        if "TPU" not in pname and "/device" not in pname:
            continue
        name = ev["name"]
        if name.startswith("jit_"):
            outer_by_pid[pid] += ev.get("dur", 0) / 1e3
            continue
        durs_by_pid[pid][name] += ev.get("dur", 0) / 1e3
        counts_by_pid[pid][name] += 1
    assert outer_by_pid or durs_by_pid, "no device events in trace"
    pick = max(outer_by_pid or durs_by_pid,
               key=lambda p: outer_by_pid.get(p, 0.0))
    outer, durs, counts = (outer_by_pid.get(pick, 0.0),
                           durs_by_pid[pick], counts_by_pid[pick])
    n_dev = len(set(outer_by_pid) | set(durs_by_pid))
    dev_note = f" [1 of {n_dev} device pids]" if n_dev > 1 else ""
    print(f"device total (outer jit event): {outer:.2f} ms over {iters} "
          f"iters ({outer / iters:.2f} ms/iter){dev_note}")
    print("per-op (the `while` row spans the chained loop body):")
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {d:9.3f} ms  x{counts[name]:<4d} {name[:110]}")
    return outer / iters, durs, counts
