"""Device mesh + data-parallel sharding.

The reference's only distribution strategy is NCCL data parallelism via
paddle Fleet (reference ``ppvector/trainer.py:299-320``,
``pk_sampler.py:41-44``; SURVEY.md §2.2). The TPU-native equivalent: a 1-D
``jax.sharding.Mesh`` over all devices with axis ``'data'``; parameters are
replicated, batches sharded on axis 0, and ``jit`` inserts the gradient
all-reduce over ICI/DCN automatically — no explicit collectives and no
per-process model wrappers.

Multi-host: call ``jax.distributed.initialize`` before anything else; each
host feeds its local shard (``shard_batch`` builds the global array from
per-host data), and rank-0-only side effects use
``jax.process_index() == 0`` exactly where the reference gates on
``local_rank == 0``.
"""

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["create_mesh", "batch_sharding", "replicated_sharding",
           "shard_batch", "local_process_info", "allgather_ragged",
           "maybe_initialize_distributed"]

_distributed_initialized = False


def maybe_initialize_distributed():
    """Multi-host bootstrap (reference launch path ``python -m
    paddle.distributed.launch --gpus ... train.py``, README.md:229-231).

    Reads the standard coordination env vars and calls
    ``jax.distributed.initialize`` once, before any backend use:

    - ``VPR_COORDINATOR``   — ``host:port`` of process 0
    - ``VPR_NUM_PROCESSES`` — world size
    - ``VPR_PROCESS_ID``    — this process's rank

    On TPU pods launched by cluster tooling (GKE/Cloud TPU), the vars are
    unnecessary — ``jax.distributed.initialize()`` auto-detects — so set
    only ``VPR_AUTO_DISTRIBUTED=1`` there. Single-process runs (no env
    vars) are untouched. ``tools/launch_multihost.py`` sets these for
    local multi-process (CPU) simulation."""
    global _distributed_initialized
    if _distributed_initialized:
        return
    coord = os.environ.get("VPR_COORDINATOR")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["VPR_NUM_PROCESSES"]),
            process_id=int(os.environ["VPR_PROCESS_ID"]))
        _distributed_initialized = True
    elif os.environ.get("VPR_AUTO_DISTRIBUTED"):
        jax.distributed.initialize()
        _distributed_initialized = True


def create_mesh(devices=None, axis_name="data"):
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh, axis_name="data"):
    """Shard axis 0 across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh, axis_name="data"):
    """Device-put a (tuple of) host array(s) with batch-axis sharding.

    With multiple processes, each host passes its *local* shard and the
    global array is assembled across hosts
    (``jax.make_array_from_process_local_data``).
    """
    sharding = batch_sharding(mesh, axis_name)
    def _put(x):
        x = np.asarray(x)
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)
    return jax.tree.map(_put, batch)


def local_process_info():
    """(rank, world_size) in reference terms (``trainer.py:292-293``)."""
    return jax.process_index(), jax.process_count()


def allgather_ragged(*arrays):
    """Allgather per-process host arrays whose leading dims differ across
    processes (each process's shard of an unevenly-split list). Pads to
    the max count, gathers, trims, and concatenates rank-major. Collective:
    every process must call with its shard; all receive the full arrays."""
    from jax.experimental import multihost_utils

    n = int(arrays[0].shape[0])
    counts = np.asarray(multihost_utils.process_allgather(
        np.asarray([n], np.int32))).reshape(-1)
    n_max = int(counts.max())
    out = []
    for a in arrays:
        a = np.asarray(a)
        if n_max > a.shape[0]:
            a = np.concatenate(
                [a, np.zeros((n_max - a.shape[0],) + a.shape[1:], a.dtype)])
        g = np.asarray(multihost_utils.process_allgather(a))
        out.append(np.concatenate(
            [g[r, :counts[r]] for r in range(len(counts))]))
    return tuple(out)
