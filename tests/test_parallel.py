"""Data-parallel sharding over the 8-device virtual CPU mesh: the full DP
train step executes sharded, gradients agree with single-device, and the
driver dryrun path works."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy suite: excluded from the < 5-min fast tier
from jax.sharding import PartitionSpec as P

from voiceprintrecognition_paddlepaddle_tpu.parallel import (
    batch_sharding, create_mesh, replicated_sharding, shard_batch)


def test_mesh_covers_all_devices():
    mesh = create_mesh()
    assert mesh.devices.size == jax.device_count() == 8
    assert mesh.axis_names == ("data",)


def test_shard_batch_places_on_axis0():
    mesh = create_mesh()
    x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    (sx,) = shard_batch((x,), mesh)
    assert sx.sharding.spec == P("data")
    np.testing.assert_array_equal(np.asarray(sx), x)


def test_dp_matmul_grad_matches_single_device():
    """Replicated-params + sharded-batch grad == unsharded grad (the jit
    all-reduce is semantically invisible)."""
    mesh = create_mesh()
    w = jnp.asarray(np.random.RandomState(0).randn(8, 4), jnp.float32)
    x = np.random.RandomState(1).randn(16, 8).astype(np.float32)
    y = np.random.RandomState(2).randn(16, 4).astype(np.float32)

    def loss(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    g_single = jax.grad(loss)(w, jnp.asarray(x), jnp.asarray(y))

    wr = jax.device_put(w, replicated_sharding(mesh))
    xs, ys = shard_batch((x, y), mesh)
    g_sharded = jax.jit(jax.grad(loss))(wr, xs, ys)
    np.testing.assert_allclose(np.asarray(g_single), np.asarray(g_sharded),
                               rtol=1e-6)


def test_graft_dryrun_multichip():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 192)
