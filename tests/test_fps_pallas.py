"""Pallas FPS kernel vs the XLA fori-loop formulation (exact parity)."""

import jax.numpy as jnp
import numpy as np

from gapro_tpu.ops.fps import fps_masked
from gapro_tpu.ops.fps_pallas import fps_masked_pallas


def test_fps_pallas_matches_xla():
    rng = np.random.default_rng(0)
    b, n, k = 3, 500, 64
    xyz = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
    valid = jnp.asarray(rng.random((b, n)) > 0.3)
    i1, v1 = fps_masked(xyz, valid, k)
    i2, v2 = fps_masked_pallas(xyz, valid, k)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_fps_pallas_few_valid():
    """n_valid < n_sample: tail must repeat the first valid index."""
    xyz = jnp.asarray(np.random.default_rng(1).normal(size=(1, 100, 3)).astype(np.float32))
    valid = jnp.zeros((1, 100), bool).at[0, 40:43].set(True)
    i1, v1 = fps_masked(xyz, valid, 8)
    i2, v2 = fps_masked_pallas(xyz, valid, 8)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    assert int(np.asarray(v2).sum()) == 3
