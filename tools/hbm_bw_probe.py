"""Measure the chip's real achievable HBM bandwidth (streaming triad-like).

Anchors tools/roofline_train.py: XLA's "bytes accessed" cost analysis
overcounts true HBM traffic (fused intermediates never leave VMEM), so a
train step can measure FASTER than the counted-bytes/spec-bandwidth bound.
The number this probe prints is the real roof to divide by.

    python tools/hbm_bw_probe.py [mib] [iters]
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


def main(mib=1024, iters=30):
    n = mib * 1024 * 1024 // 4
    x = jnp.arange(n, dtype=jnp.float32)

    @jax.jit
    def run(x):
        def body(_, v):
            # 1 read + 1 write per element per iteration; the barrier
            # stops XLA fusing the whole loop into one register-resident
            # elementwise chain (observed: 30 iters collapsed to one pass)
            return jax.lax.optimization_barrier(v * 1.0000001 + 1e-7)
        return jax.lax.fori_loop(0, iters, body, x)

    # sync by host-transferring a scalar (block_until_ready has been seen
    # to return early under the axon tunnel)
    float(np.asarray(run(x)[0]))
    t0 = time.perf_counter()
    float(np.asarray(run(x)[0]))
    dt = (time.perf_counter() - t0) / iters
    gb = 2 * n * 4 / 1e9
    print(f"streaming {mib} MiB x {iters} iters: {dt*1e3:.3f} ms/iter "
          f"-> {gb/dt:.1f} GB/s achievable")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 1024, int(a[1]) if len(a) > 1 else 30)
