import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gapro_tpu.sparse import build_unet_plan, down_conv, inverse_conv, subm_conv
from gapro_tpu.sparse.plan import _SUBM_OFFSETS, downsample_grid, subm_neighbor_table
from gapro_tpu.sparse.tensor import SparseGrid
from gapro_tpu.sparse.unet import SparseUNetBackbone
from gapro_tpu.ops.voxelize import voxelize


def _make_grid(coords_np, capacity, shape=(16, 16, 16), batch_size=1):
    n = len(coords_np)
    maps = voxelize(
        jnp.asarray(np.pad(coords_np, ((0, capacity - n), (0, 0)), constant_values=-1)),
        shape,
        capacity,
        valid=jnp.arange(capacity) < n,
    )
    return SparseGrid(
        coords=maps.voxel_coords,
        valid=maps.valid_voxel,
        num_voxels=maps.num_voxels,
        spatial_shape=shape,
        batch_size=batch_size,
    )


def _random_coords(rng, n, shape, batch_size=1):
    seen = set()
    out = []
    while len(out) < n:
        c = (
            rng.integers(0, batch_size),
            rng.integers(0, shape[0]),
            rng.integers(0, shape[1]),
            rng.integers(0, shape[2]),
        )
        if c not in seen:
            seen.add(c)
            out.append(c)
    return np.array(out, np.int32)


def test_subm_neighbor_table_against_bruteforce():
    rng = np.random.default_rng(0)
    shape = (8, 8, 8)
    coords = _random_coords(rng, 40, shape, batch_size=2)
    grid = _make_grid(coords, 64, shape, batch_size=2)
    nbr = np.asarray(subm_neighbor_table(grid))

    gc = np.asarray(grid.coords)
    lookup = {tuple(gc[i]): i for i in range(int(grid.num_voxels))}
    for v in range(int(grid.num_voxels)):
        b, z, y, x = gc[v]
        for k, (dz, dy, dx) in enumerate(_SUBM_OFFSETS):
            want = lookup.get((b, z + dz, y + dy, x + dx), -1)
            nz, ny, nx = z + dz, y + dy, x + dx
            if not (0 <= nz < shape[0] and 0 <= ny < shape[1] and 0 <= nx < shape[2]):
                want = -1
            assert nbr[v, k] == want, (v, k)
    # padded rows have no neighbors
    assert (nbr[int(grid.num_voxels):] == -1).all()


def test_downsample_grid():
    rng = np.random.default_rng(1)
    shape = (8, 8, 8)
    coords = _random_coords(rng, 30, shape)
    grid = _make_grid(coords, 32, shape)
    out_grid, parent, offset_id, child, dropped = jax.tree_util.tree_map(
        np.asarray, downsample_grid(grid, 32)
    )
    assert int(dropped) == 0

    gc = np.asarray(grid.coords)
    want_coarse = np.unique(
        np.concatenate([gc[:30, :1], gc[:30, 1:] // 2], 1), axis=0
    )
    nv = int(out_grid.num_voxels)
    assert nv == len(want_coarse)
    np.testing.assert_array_equal(out_grid.coords[:nv], want_coarse)
    for i in range(30):
        p = parent[i]
        np.testing.assert_array_equal(out_grid.coords[p, 1:], gc[i, 1:] // 2)
        assert offset_id[i] == (gc[i, 1] % 2) * 4 + (gc[i, 2] % 2) * 2 + gc[i, 3] % 2
        assert child[p, offset_id[i]] == i  # child table inverts (parent, offset)
    # absent (parent, offset) slots are -1
    filled = {(int(parent[i]), int(offset_id[i])) for i in range(30)}
    for p in range(nv):
        for kk in range(8):
            if (p, kk) not in filled:
                assert child[p, kk] == -1


def test_subm_conv_matches_dense_conv():
    rng = np.random.default_rng(2)
    shape = (6, 6, 6)
    coords = _random_coords(rng, 25, shape)
    grid = _make_grid(coords, 32, shape)
    nbr = subm_neighbor_table(grid)
    cin, cout = 3, 5
    nv = int(grid.num_voxels)
    feats = np.zeros((32, cin), np.float32)
    feats[:nv] = rng.normal(size=(nv, cin))
    w = rng.normal(size=(27, cin, cout)).astype(np.float32)

    got = np.asarray(subm_conv(jnp.asarray(feats), nbr, jnp.asarray(w), grid.valid, chunk=16))

    # dense oracle
    dense = np.zeros(shape + (cin,), np.float32)
    gc = np.asarray(grid.coords)
    for v in range(nv):
        dense[gc[v, 1], gc[v, 2], gc[v, 3]] = feats[v]
    for v in range(nv):
        z, y, x = gc[v, 1:]
        acc = np.zeros(cout, np.float32)
        for k, (dz, dy, dx) in enumerate(_SUBM_OFFSETS):
            nz, ny, nx = z + dz, y + dy, x + dx
            if 0 <= nz < shape[0] and 0 <= ny < shape[1] and 0 <= nx < shape[2]:
                acc += dense[nz, ny, nx] @ w[k]
        np.testing.assert_allclose(got[v], acc, rtol=1e-4, atol=1e-4)
    assert (got[nv:] == 0).all()


def test_down_and_inverse_conv():
    rng = np.random.default_rng(3)
    shape = (8, 8, 8)
    coords = _random_coords(rng, 30, shape)
    grid = _make_grid(coords, 32, shape)
    out_grid, parent, offset_id, child, _ = downsample_grid(grid, 32)
    nv = int(grid.num_voxels)
    cin, cout = 4, 6
    feats = np.zeros((32, cin), np.float32)
    feats[:nv] = rng.normal(size=(nv, cin))
    w = rng.normal(size=(8, cin, cout)).astype(np.float32)

    got = np.asarray(down_conv(jnp.asarray(feats), child, jnp.asarray(w)))
    par = np.asarray(parent)
    off = np.asarray(offset_id)
    want = np.zeros((32, cout), np.float32)
    for i in range(nv):
        want[par[i]] += feats[i] @ w[off[i]]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    # inverse: fine[i] = coarse[parent[i]] @ w_up[offset[i]]
    ncv = int(out_grid.num_voxels)
    coarse = np.zeros((32, cout), np.float32)
    coarse[:ncv] = rng.normal(size=(ncv, cout))
    w_up = rng.normal(size=(8, cout, cin)).astype(np.float32)
    got_up = np.asarray(
        inverse_conv(jnp.asarray(coarse), parent, offset_id, jnp.asarray(w_up), grid.valid)
    )
    for i in range(nv):
        np.testing.assert_allclose(got_up[i], coarse[par[i]] @ w_up[off[i]], rtol=1e-4, atol=1e-4)
    assert (got_up[nv:] == 0).all()


def test_unet_backbone_forward_and_padding_invariance():
    rng = np.random.default_rng(4)
    shape = (16, 16, 16)
    coords = _random_coords(rng, 50, shape)
    cin = 6
    feats_np = rng.normal(size=(50, cin)).astype(np.float32)

    def run(capacity):
        grid = _make_grid(coords, capacity, shape)
        plan = build_unet_plan(grid, 3, 1.0)
        f = np.zeros((capacity, cin), np.float32)
        # voxelize reorders: map through point2voxel equivalence — here the
        # grid rows are sorted coords; find row of each original coord
        gc = np.asarray(grid.coords)
        row = {tuple(gc[i]): i for i in range(int(grid.num_voxels))}
        for i, c in enumerate(coords):
            f[row[tuple(c)]] = feats_np[i]
        model = SparseUNetBackbone(channels=8, num_blocks=3, in_channels=cin)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(f), plan, False)
        out = model.apply(variables, jnp.asarray(f), plan, False)
        return np.asarray(out), grid

    out64, grid64 = run(64)
    out96, grid96 = run(96)
    nv = int(grid64.num_voxels)
    assert out64.shape == (64, 8)
    assert np.isfinite(out64[:nv]).all()
    # same valid voxels in both capacities -> same features
    np.testing.assert_allclose(out64[:nv], out96[:nv], rtol=1e-4, atol=1e-4)
    assert (np.abs(out64[:nv]) > 0).any()


def test_subm_conv_packed_matches_plain():
    """z/y-packed gather form == plain 27-row gather form (same math,
    different data movement)."""
    from gapro_tpu.sparse.conv import subm_conv_packed
    from gapro_tpu.sparse.plan import zy_pack_tables

    rng = np.random.default_rng(7)
    shape = (9, 11, 8)  # odd extents exercise the (Z+1)//2 block edges
    coords = _random_coords(rng, 120, shape, batch_size=2)
    grid = _make_grid(coords, 160, shape, batch_size=2)
    nbr = subm_neighbor_table(grid)
    parent, parity, pk_nbr = zy_pack_tables(grid)

    cin, cout = 5, 7
    feats = rng.normal(size=(160, cin)).astype(np.float32)
    feats[~np.asarray(grid.valid)] = 0.0
    w = rng.normal(size=(27, cin, cout)).astype(np.float32)

    want = np.asarray(subm_conv(jnp.asarray(feats), nbr, jnp.asarray(w), grid.valid))
    got = np.asarray(
        subm_conv_packed(jnp.asarray(feats), parent, parity, pk_nbr,
                         jnp.asarray(w), grid.valid)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_subm_conv_packed_grad_matches_plain():
    from gapro_tpu.sparse.conv import subm_conv_packed
    from gapro_tpu.sparse.plan import zy_pack_tables

    rng = np.random.default_rng(11)
    shape = (8, 8, 8)
    coords = _random_coords(rng, 50, shape)
    grid = _make_grid(coords, 64, shape)
    nbr = subm_neighbor_table(grid)
    parent, parity, pk_nbr = zy_pack_tables(grid)

    cin, cout = 4, 3
    feats = jnp.asarray(rng.normal(size=(64, cin)).astype(np.float32))
    feats = jnp.where(grid.valid[:, None], feats, 0.0)
    w = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32))

    def loss_plain(f, ww):
        return jnp.sum(subm_conv(f, nbr, ww, grid.valid) ** 2)

    def loss_packed(f, ww):
        return jnp.sum(subm_conv_packed(f, parent, parity, pk_nbr, ww, grid.valid) ** 2)

    gf1, gw1 = jax.grad(loss_plain, argnums=(0, 1))(feats, w)
    gf2, gw2 = jax.grad(loss_packed, argnums=(0, 1))(feats, w)
    # invalid rows of the feature grad are dead (their features are forced
    # to zero upstream) — compare valid rows only
    m = np.asarray(grid.valid)
    np.testing.assert_allclose(np.asarray(gf2)[m], np.asarray(gf1)[m], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw2), np.asarray(gw1), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_plan_shrink_schedule():
    """Per-level capacity schedule: measured occupancy decays superlinearly
    with depth, so build_unet_plan accepts one factor OR a per-level list
    (sparse/plan.py; a flat 0.5 both truncated level 1 and left levels 3+
    at <30% fill on the bench scene — docs/PERF.md)."""
    rng = np.random.default_rng(3)
    coords = _random_coords(rng, 400, (16, 16, 16))
    grid = _make_grid(coords, 1024)

    plan = build_unet_plan(grid, 4, shrink=(1.0, 0.5, 0.25))
    caps = [lp.grid.coords.shape[0] for lp in plan.levels]
    assert caps == [1024, 1024, 512, 256]
    # generous schedule -> nothing dropped at any level
    assert all(int(lp.dropped_next) == 0 for lp in plan.levels)

    # a backbone runs on the scheduled plan exactly as on a flat one
    feats = jnp.asarray(rng.normal(size=(1024, 3)).astype(np.float32))
    feats = jnp.where(grid.valid[:, None], feats, 0.0)
    bb = SparseUNetBackbone(channels=4, num_blocks=4, in_channels=3)
    vars_ = bb.init(jax.random.PRNGKey(0), feats, plan, False)
    out = bb.apply(vars_, feats, plan, False)
    assert np.isfinite(np.asarray(out)).all()

    # an over-tight schedule must COUNT its drops, never silently truncate
    tight = build_unet_plan(grid, 2, shrink=(0.05,))
    assert int(tight.levels[0].dropped_next) > 0


def test_subm_neighbor_table_dense_grid_boundaries():
    """Fully-dense 4x4x4 grid: every x=0 / x=X-1 boundary voxel has a real
    key at lo-1 / lo+1 belonging to a DIFFERENT (y-1, X-1) / (y+1, 0)
    voxel — the spurious-match case of the 9-run searchsorted rewrite
    (positions must advance on the raw key match while the emitted index
    is masked by the per-dx x-bounds)."""
    shape = (4, 4, 4)
    coords = np.array([(0, z, y, x) for z in range(4) for y in range(4)
                       for x in range(4)], np.int32)
    grid = _make_grid(coords, 64, shape, batch_size=1)
    nbr = np.asarray(subm_neighbor_table(grid))

    gc = np.asarray(grid.coords)
    lookup = {tuple(gc[i]): i for i in range(int(grid.num_voxels))}
    for v in range(int(grid.num_voxels)):
        b, z, y, x = gc[v]
        for k, (dz, dy, dx) in enumerate(_SUBM_OFFSETS):
            nz, ny, nx = z + dz, y + dy, x + dx
            want = -1
            if 0 <= nz < 4 and 0 <= ny < 4 and 0 <= nx < 4:
                want = lookup.get((b, nz, ny, nx), -1)
            assert nbr[v, k] == want, (v, k, (dz, dy, dx))
