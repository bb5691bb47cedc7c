"""Device A/B: fbank front-end with CMN folded into the kernel vs the
split path (kernel + separate apply_cmn_and_mask), plus parity.

The round-3 embed trace showed 0.34 ms/iter of reshape/CMN fusions around
the 0.76 ms fbank kernel at b256 x 3 s (ROADMAP "CMN fold" candidate;
VERDICT r3 item 8: done = measured front-end < 0.9 ms/iter or candidate
closed with a number). Timing is device-serial: ITERS iterations chained
in one jitted fori_loop with a data dependency, synced by host transfer.

Usage: python tools/fbank_cmn_bench.py [batch] [seconds] [iters] [ragged]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def main(batch=256, seconds=3, iters=50, ragged=False):
    from voiceprintrecognition_paddlepaddle_tpu.ops.features import (
        apply_cmn_and_mask)
    from voiceprintrecognition_paddlepaddle_tpu.ops.pallas_fbank import (
        fbank_pallas)

    sr, n_mels = 16000, 80
    rng = np.random.RandomState(0)
    waves = jnp.asarray(
        rng.randn(batch, sr * seconds).astype(np.float32) * 0.1)
    ratios = (jnp.asarray(rng.uniform(0.3, 1.0, size=batch), jnp.float32)
              if ragged else None)

    def split(w):
        return apply_cmn_and_mask(
            fbank_pallas(w, sr=sr, n_mels=n_mels), ratios)

    def folded(w):
        return fbank_pallas(w, sr=sr, n_mels=n_mels, cmn=True,
                            input_lens_ratio=ratios)

    def chained(fn):
        @jax.jit
        def run(w):
            def body(i, carry):
                w2, acc = carry
                f = fn(w2)
                return (w2 * (1.0 + f[0, 0, 0] * 1e-12), acc + f[0, 0, 0])
            return jax.lax.fori_loop(0, iters, body, (w, jnp.float32(0)))
        return run

    # parity on device first
    a = np.asarray(split(waves))
    b = np.asarray(folded(waves))
    d = np.abs(a - b)
    print(f"parity: max|d|={d.max():.2e} p99={np.percentile(d, 99):.2e}")

    for name, fn in (("split", split), ("folded", folded)):
        run = chained(fn)
        float(np.asarray(run(waves)[1]))  # compile + warm
        t0 = time.perf_counter()
        float(np.asarray(run(waves)[1]))
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:7s} b{batch} x {seconds}s ragged={bool(ragged)}: "
              f"{dt:.3f} ms/iter")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 256,
         int(a[1]) if len(a) > 1 else 3,
         int(a[2]) if len(a) > 2 else 50,
         bool(int(a[3])) if len(a) > 3 else False)
