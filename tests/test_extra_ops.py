import jax.numpy as jnp
import numpy as np

from gapro_tpu.ops.components import cluster_points, connected_components
from gapro_tpu.ops.fps import fps_weights_masked, fps_with_dist_masked
from gapro_tpu.ops.interpolate import gather_points, group_points, knn, three_interpolate
from gapro_tpu.ops.maskiou import mask_iou_on_cluster, mask_label


def test_knn_and_interpolate():
    rng = np.random.default_rng(0)
    ref = rng.normal(size=(1, 50, 3)).astype(np.float32)
    q = ref[:, :10] + 1e-3
    rv = np.ones((1, 50), bool)
    qv = np.ones((1, 10), bool)
    d, idx = knn(jnp.asarray(q), jnp.asarray(ref), jnp.asarray(qv), jnp.asarray(rv), 3)
    # nearest neighbor of q[i] is ref[i]
    np.testing.assert_array_equal(np.asarray(idx)[0, :, 0], np.arange(10))
    feats = rng.normal(size=(1, 50, 4)).astype(np.float32)
    out = three_interpolate(jnp.asarray(feats), idx, d, jnp.asarray(qv))
    # near-duplicate points -> weight concentrates on the nearest
    np.testing.assert_allclose(np.asarray(out)[0], feats[0, :10], atol=1e-2)


def test_gather_group():
    v = jnp.arange(12.0).reshape(1, 6, 2)
    idx = jnp.asarray([[2, 0]])
    np.testing.assert_array_equal(np.asarray(gather_points(v, idx))[0, 0], [4, 5])
    gidx = jnp.asarray([[[1, 3], [0, 0]]])
    assert group_points(v, gidx).shape == (1, 2, 2, 2)


def test_connected_components_two_blobs():
    # points 0-4 chained; points 5-9 chained; no cross edges
    nbr = np.full((12, 2), -1, np.int32)
    for i in range(4):
        nbr[i, 0] = i + 1
        nbr[i + 1, 1] = i
    for i in range(5, 9):
        nbr[i, 0] = i + 1
        nbr[i + 1, 1] = i
    valid = np.zeros(12, bool)
    valid[:10] = True
    lab = np.asarray(connected_components(jnp.asarray(nbr), jnp.asarray(valid)))
    assert (lab[:5] == 0).all()
    assert (lab[5:10] == 5).all()
    assert (lab[10:] == -1).all()


def test_cluster_points_semantic_split():
    rng = np.random.default_rng(1)
    a = rng.normal(0, 0.05, (60, 3)) + [0, 0, 0]
    b = rng.normal(0, 0.05, (60, 3)) + [0.1, 0, 0]  # overlapping spatially
    xyz = np.concatenate([a, b]).astype(np.float32)
    sem = np.array([3] * 60 + [7] * 60)
    valid = np.ones(120, bool)
    lab, sizes = jax.tree_util.tree_map(
        np.asarray,
        cluster_points(jnp.asarray(xyz), jnp.asarray(valid), jnp.asarray(sem),
                       0.3, k=16, min_points=10),
    )
    assert len(np.unique(lab[:60])) == 1
    assert len(np.unique(lab[60:])) == 1
    assert lab[0] != lab[60]


def test_mask_iou_and_label():
    inst = np.array([0, 0, 0, 1, 1, -100])
    props = np.array([
        [1, 1, 1, 0, 0, 0],  # exactly inst 0
        [0, 0, 1, 1, 1, 1],  # mixed
    ], np.float32)
    ious = np.asarray(mask_iou_on_cluster(jnp.asarray(props), jnp.asarray(inst), 2))
    np.testing.assert_allclose(ious[0], [1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(ious[1, 1], 2 / 4, atol=1e-6)
    labels, _ = mask_label(jnp.asarray(props), jnp.asarray(inst), 0.4, 2)
    labels = np.asarray(labels)
    np.testing.assert_array_equal(labels[0], [1, 1, 1, 0, 0, 0])
    np.testing.assert_array_equal(labels[1], [0, 0, 0, 1, 1, 0])


def test_fps_variants():
    rng = np.random.default_rng(2)
    xyz = rng.normal(size=(1, 40, 3)).astype(np.float32)
    valid = np.ones((1, 40), bool)
    w = np.ones((1, 40), np.float32)
    w[0, 7] = 100.0
    idx, sv = fps_weights_masked(jnp.asarray(xyz), jnp.asarray(w), jnp.asarray(valid), 4)
    assert int(np.asarray(idx)[0, 0]) == 7  # starts at the heaviest point
    assert np.asarray(sv).all()

    d2 = np.sum((xyz[:, :, None] - xyz[:, None]) ** 2, -1).astype(np.float32)
    idx2, _ = fps_with_dist_masked(jnp.asarray(d2), jnp.asarray(valid),
                                   jnp.zeros((1,), jnp.int32), 4)
    # matches xyz-based FPS started at 0
    from gapro_tpu.ops.fps import fps_masked

    idx_ref, _ = fps_masked(jnp.asarray(xyz), jnp.asarray(valid), 4)
    np.testing.assert_array_equal(np.asarray(idx2), np.asarray(idx_ref))


import jax  # noqa: E402  (used by tree_map above)
