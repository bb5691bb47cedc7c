"""Shared device-benchmark plumbing for the tools/ measurement scripts.

Two things every chained-timing tool needs, in one place so they cannot
drift (they did: four tools hand-rolled this loop and split on the sync
method):

- ``cache_dir()``: the repo's persistent compilation cache, derived from
  ``__file__`` (never hardcode the checkout path).
- ``chain_ms(fn, x, iters)``: device-serial chained timing — ``iters``
  applications of ``fn`` inside one jitted ``fori_loop`` with a
  data-dependent carry (so XLA cannot reorder or elide iterations),
  synced by HOST-TRANSFERRING a scalar rather than
  ``jax.block_until_ready`` (the latter has been seen to return early
  under this lab's axon tunnel — measured equal to host sync on healthy
  runs, 5.909 vs 5.911 ms/iter on a 3 GFLOP matmul chain, but the host
  transfer is the conservative arbiter).
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def cache_dir():
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")


def chain_ms(fn, x, iters, warmup=True):
    """ms per iteration of ``fn`` over ``iters`` device-serial steps."""

    @jax.jit
    def run(x):
        def body(_, carry):
            xx, acc = carry
            y = fn(xx)
            d = y.reshape(-1)[0].astype(jnp.float32)
            bump = jnp.where(jnp.isfinite(d), d, 0.0) * 1e-12
            return (xx * (1.0 + bump.astype(xx.dtype)), acc + bump)
        return jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0)))

    if warmup:
        float(np.asarray(run(x)[1]))
    t0 = time.perf_counter()
    float(np.asarray(run(x)[1]))
    return (time.perf_counter() - t0) / iters * 1000


def kaldi_frames(n_samples):
    """Frame count of the production Kaldi fbank front-end (25 ms
    window / 10 ms shift, snip_edges): (n - 400) // 160 + 1."""
    return (int(n_samples) - 400) // 160 + 1
