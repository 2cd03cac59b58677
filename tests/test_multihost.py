"""Multi-host helper smoke (§2.5: the reference analog is
ISBNet/isbnet/util/dist.py:9-70, exercised only by its launch scripts; here
the single-process no-op path and the collective helpers get executed lines
on the 8-device CPU mesh)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from gapro_tpu.parallel.mesh import (data_parallel_mesh, initialize_multihost,
                                     process_allgather, replicate, shard_batch)


def test_initialize_multihost_single_process_noop(monkeypatch):
    # no coordinator configured -> must be a no-op, not an error
    monkeypatch.delenv("JAX_COORDINATOR", raising=False)
    initialize_multihost()
    assert jax.process_count() == 1


def test_process_allgather_single_process():
    tree = {"ap": np.float32(0.5), "counts": np.arange(6, dtype=np.int32)}
    out = process_allgather(tree)
    # single process: gather returns the same values (possibly with a
    # leading process axis, version-dependent) — content must round-trip
    np.testing.assert_allclose(np.asarray(out["ap"]).reshape(-1)[0], 0.5)
    np.testing.assert_array_equal(
        np.asarray(out["counts"]).reshape(-1)[-6:], np.arange(6))


def test_replicate_and_shard_batch_on_mesh():
    mesh = data_parallel_mesh(8)
    assert mesh.devices.size == 8

    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    rep = replicate(params, mesh)
    assert rep["w"].sharding.is_fully_replicated

    batch = jnp.arange(8 * 3, dtype=jnp.float32).reshape(8, 3)
    sh = shard_batch(batch, mesh)
    assert not sh.sharding.is_fully_replicated
    # per-device shards carry one row each
    assert sh.addressable_shards[0].data.shape == (1, 3)
    # a psum over the mesh sees every shard
    from jax import shard_map

    total = jax.jit(shard_map(
        lambda x: jax.lax.psum(jnp.sum(x), "dp"),
        mesh=mesh, in_specs=(jax.sharding.PartitionSpec("dp"),),
        out_specs=jax.sharding.PartitionSpec()))(sh)
    np.testing.assert_allclose(float(total), float(jnp.sum(batch)))
