import jax.numpy as jnp
import numpy as np

from gapro_tpu.ops.ballquery import ball_query_masked
from gapro_tpu.ops.fps import fps_masked


def _np_fps(xyz, n_sample):
    n = len(xyz)
    dist = np.full(n, 1e10)
    out = np.zeros(n_sample, np.int64)
    last = 0
    for i in range(n_sample):
        out[i] = last
        d = ((xyz - xyz[last]) ** 2).sum(-1)
        dist = np.minimum(dist, d)
        last = int(np.argmax(dist))
    return out


def test_fps_matches_numpy():
    rng = np.random.default_rng(0)
    n, s = 200, 16
    xyz = rng.normal(size=(1, n, 3)).astype(np.float32)
    valid = np.ones((1, n), bool)
    idx, svalid = fps_masked(jnp.asarray(xyz), jnp.asarray(valid), s)
    want = _np_fps(xyz[0], s)
    np.testing.assert_array_equal(np.asarray(idx)[0], want)
    assert np.asarray(svalid).all()


def test_fps_masked_ignores_padding():
    rng = np.random.default_rng(1)
    n, s = 100, 8
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    xyz_pad = np.concatenate([xyz, np.full((30, 3), 100.0, np.float32)])
    valid = np.concatenate([np.ones(n, bool), np.zeros(30, bool)])
    idx, _ = fps_masked(jnp.asarray(xyz_pad[None]), jnp.asarray(valid[None]), s)
    idx = np.asarray(idx)[0]
    assert (idx < n).all()
    want = _np_fps(xyz, s)
    np.testing.assert_array_equal(idx, want)


def test_fps_fewer_valid_than_samples():
    xyz = np.zeros((1, 10, 3), np.float32)
    xyz[0, :4] = np.random.default_rng(0).normal(size=(4, 3))
    valid = np.zeros((1, 10), bool)
    valid[0, :4] = True
    idx, svalid = fps_masked(jnp.asarray(xyz), jnp.asarray(valid), 8)
    assert np.asarray(svalid)[0].sum() == 4
    assert (np.asarray(idx)[0] < 4).all()


def test_ball_query_matches_bruteforce():
    rng = np.random.default_rng(2)
    n, q, k, r = 500, 20, 8, 0.5
    pts = rng.uniform(0, 2, size=(1, n, 3)).astype(np.float32)
    queries = pts[:, :q]
    out, counts = ball_query_masked(
        jnp.asarray(queries),
        jnp.asarray(pts),
        jnp.ones((1, q), bool),
        jnp.ones((1, n), bool),
        r,
        k,
        chunk=128,
    )
    out, counts = np.asarray(out)[0], np.asarray(counts)[0]
    for i in range(q):
        d2 = ((pts[0] - queries[0, i]) ** 2).sum(-1)
        within = np.nonzero(d2 <= r * r + 1e-6)[0]
        strict = np.nonzero(d2 <= r * r - 1e-6)[0]
        want_k = min(len(within), k)
        assert min(len(strict), k) <= counts[i] <= want_k
        # first hits in index order (allow boundary tolerance)
        got = out[i, : counts[i]]
        assert set(got).issubset(set(within))
        np.testing.assert_array_equal(np.sort(got), got)  # ascending
        # remaining slots repeat the first hit
        assert (out[i, counts[i]:] == got[0]).all()


def test_ball_query_self_always_included():
    pts = np.array([[[0, 0, 0], [5, 5, 5], [10, 10, 10]]], np.float32)
    out, counts = ball_query_masked(
        jnp.asarray(pts),
        jnp.asarray(pts),
        jnp.ones((1, 3), bool),
        jnp.ones((1, 3), bool),
        0.1,
        4,
    )
    counts = np.asarray(counts)[0]
    np.testing.assert_array_equal(counts, [1, 1, 1])
    np.testing.assert_array_equal(np.asarray(out)[0][:, 0], [0, 1, 2])


def test_ball_query_grid_matches_tiled():
    import jax.numpy as jnp
    from gapro_tpu.ops.ballquery import ball_query_grid, ball_query_tiled

    rng = np.random.default_rng(7)
    n, q, k = 600, 40, 8
    pts = rng.uniform(0, 3, (1, n, 3)).astype(np.float32)
    queries = pts[:, :q]
    pv = np.ones((1, n), bool)
    pv[0, 550:] = False
    qv = np.ones((1, q), bool)
    a_idx, a_cnt = ball_query_grid(jnp.asarray(queries), jnp.asarray(pts),
                                   jnp.asarray(qv), jnp.asarray(pv), 0.35, k,
                                   cell_cap=600)
    b_idx, b_cnt = ball_query_tiled(jnp.asarray(queries), jnp.asarray(pts),
                                    jnp.asarray(qv), jnp.asarray(pv), 0.35, k)
    np.testing.assert_array_equal(np.asarray(a_cnt), np.asarray(b_cnt))
    np.testing.assert_array_equal(np.asarray(a_idx), np.asarray(b_idx))


def test_fps_ia_6d_uses_all_dims():
    """6-D FPS must separate points that coincide in xyz but differ in the
    extra feature dims (the instance-aware intent)."""
    from gapro_tpu.ops.fps import fps_ia_masked

    # 8 points at the SAME xyz; feature dims split them into two clusters
    xyz = np.zeros((1, 8, 3), np.float32)
    extra = np.zeros((1, 8, 3), np.float32)
    extra[0, 4:, 0] = 10.0  # second cluster far away in feature space
    feats = jnp.asarray(np.concatenate([xyz, extra], axis=-1))
    valid = jnp.ones((1, 8), bool)
    idx, ok = fps_ia_masked(feats, valid, 2)
    idx = np.asarray(idx)[0]
    # first pick is index 0 (cluster A); second must come from cluster B
    assert idx[0] == 0 and idx[1] >= 4


def test_fps_hybrid_switches_coordinate_sets():
    """Late rounds must sample by the OFFSET coords: two xyz-coincident
    clusters that are far apart in offset space get split only after the
    stage switch."""
    from gapro_tpu.ops.fps import fps_hybrid_masked, fps_masked

    rng = np.random.default_rng(0)
    n = 64
    xyz = rng.normal(size=(1, n, 3)).astype(np.float32)
    off = xyz.copy()
    off[0, : n // 2, 0] += 100.0  # offset space separates the halves
    valid = np.ones((1, n), bool)
    # ratio=2 -> first half of samples by xyz, second half by offset
    idx, ok = fps_hybrid_masked(jnp.asarray(xyz), jnp.asarray(off),
                                jnp.asarray(valid), 16, 2.0)
    idx_plain, _ = fps_masked(jnp.asarray(xyz), jnp.asarray(valid), 16)
    assert ok.all()
    # the hybrid sequence must diverge from plain FPS after the switch
    assert not np.array_equal(np.asarray(idx), np.asarray(idx_plain))
    # pure-xyz stage matches plain FPS exactly (shared prefix)
    np.testing.assert_array_equal(np.asarray(idx)[0, :7],
                                  np.asarray(idx_plain)[0, :7])
