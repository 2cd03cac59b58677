import jax.numpy as jnp
import numpy as np

from gapro_tpu.ops.voxelize import (
    devoxelize,
    voxel_feats_mean,
    voxel_gather_first,
    voxelize,
)


def _numpy_voxelize(coords):
    """Oracle: unique rows in lexicographic order + inverse map."""
    uniq, inverse = np.unique(coords, axis=0, return_inverse=True)
    return uniq, inverse


def test_voxelize_matches_numpy_unique():
    rng = np.random.default_rng(0)
    n = 500
    coords = np.zeros((n, 4), dtype=np.int32)
    coords[:, 0] = rng.integers(0, 2, size=n)
    coords[:, 1:] = rng.integers(0, 10, size=(n, 3))
    extents = (16, 16, 16)
    cap = 512

    maps = voxelize(jnp.asarray(coords), extents, cap)
    uniq, inverse = _numpy_voxelize(coords)
    v = int(maps.num_voxels)
    assert v == len(uniq)
    np.testing.assert_array_equal(np.asarray(maps.voxel_coords)[:v], uniq)
    np.testing.assert_array_equal(np.asarray(maps.point2voxel), inverse)

    # first-point gather: voxel label = label of lowest-index member point
    labels = rng.integers(0, 20, size=n).astype(np.int32)
    vox_labels = np.asarray(voxel_gather_first(jnp.asarray(labels), maps))[:v]
    for vid in range(v):
        members = np.nonzero(inverse == vid)[0]
        assert vox_labels[vid] == labels[members.min()]


def test_voxelize_with_padding_mask():
    coords = np.array(
        [[0, 1, 1, 1], [0, 1, 1, 1], [0, 2, 2, 2], [0, 0, 0, 0], [0, 0, 0, 0]],
        dtype=np.int32,
    )
    valid = np.array([True, True, True, False, False])
    maps = voxelize(jnp.asarray(coords), (4, 4, 4), 8, valid=jnp.asarray(valid))
    assert int(maps.num_voxels) == 2
    p2v = np.asarray(maps.point2voxel)
    assert p2v[0] == p2v[1] >= 0
    assert p2v[3] == -1 and p2v[4] == -1


def test_voxel_feats_mean_and_devoxelize():
    coords = np.array([[0, 0, 0, 0], [0, 0, 0, 0], [0, 1, 0, 0]], dtype=np.int32)
    feats = np.array([[1.0, 2.0], [3.0, 4.0], [10.0, 20.0]], dtype=np.float32)
    maps = voxelize(jnp.asarray(coords), (4, 4, 4), 4)
    vf = np.asarray(voxel_feats_mean(jnp.asarray(feats), maps.point2voxel, 4))
    np.testing.assert_allclose(vf[0], [2.0, 3.0])
    np.testing.assert_allclose(vf[1], [10.0, 20.0])
    np.testing.assert_allclose(vf[2], 0.0)

    back = np.asarray(devoxelize(jnp.asarray(vf), maps.point2voxel))
    np.testing.assert_allclose(back[0], [2.0, 3.0])
    np.testing.assert_allclose(back[1], [2.0, 3.0])
    np.testing.assert_allclose(back[2], [10.0, 20.0])


def test_voxelize_capacity_overflow_drops_tail():
    coords = np.stack(
        [np.zeros(10, np.int32), np.arange(10, dtype=np.int32), np.zeros(10, np.int32), np.zeros(10, np.int32)],
        axis=1,
    )
    maps = voxelize(jnp.asarray(coords), (16, 4, 4), 4)
    assert int(maps.num_voxels) == 4
    p2v = np.asarray(maps.point2voxel)
    assert (p2v[:4] >= 0).all()
    assert (p2v[4:] == -1).all()
