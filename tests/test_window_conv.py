"""Windowed monotone-gather conv (sparse/window_conv.py) vs the plain
gather-GEMM reference implementation, including the escapee-correction
path and both gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from gapro_tpu.ops.voxelize import voxelize
from gapro_tpu.sparse.conv import subm_conv
from gapro_tpu.sparse.plan import subm_neighbor_table
from gapro_tpu.sparse.tensor import SparseGrid
import pytest
from gapro_tpu.sparse.window_conv import (
    WINDOW,
    build_window_tables,
    subm_conv_window,
)


def _grid_from(coords_np, cap, shape):
    n = len(coords_np)
    coords = np.pad(coords_np, ((0, cap - n), (0, 0)), constant_values=-1)
    maps = voxelize(jnp.asarray(coords), shape, cap, valid=jnp.arange(cap) < n)
    return SparseGrid(coords=maps.voxel_coords, valid=maps.valid_voxel,
                      num_voxels=maps.num_voxels, spatial_shape=shape,
                      batch_size=int(coords_np[:, 0].max()) + 1)


def _random_grid(seed, n, cap, shape, batch=1):
    rng = np.random.default_rng(seed)
    pts = set()
    while len(pts) < n:
        pts.add((rng.integers(0, batch), rng.integers(0, shape[0]),
                 rng.integers(0, shape[1]), rng.integers(0, shape[2])))
    return _grid_from(np.array(sorted(pts), np.int32), cap, shape)


def _check(grid, cin=8, cout=16, seed=0, tol=1e-4, esc_cap=None):
    rng = np.random.default_rng(seed)
    nbr = subm_neighbor_table(grid)
    tabs = build_window_tables(nbr, esc_cap=esc_cap)
    assert int(tabs.esc_overflow) == 0
    cap = grid.capacity
    feats = jnp.where(grid.valid[:, None],
                      jnp.asarray(rng.normal(size=(cap, cin)).astype(np.float32)), 0.0)
    w = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32))

    want = np.asarray(subm_conv(feats, nbr, w, grid.valid))
    got = np.asarray(subm_conv_window(feats, tabs, w, grid.valid))
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)

    def lp(f, ww):
        return jnp.sum(jnp.sin(subm_conv(f, nbr, ww, grid.valid)))

    def lw(f, ww):
        return jnp.sum(jnp.sin(subm_conv_window(f, tabs, ww, grid.valid)))

    gf1, gw1 = jax.grad(lp, (0, 1))(feats, w)
    gf2, gw2 = jax.grad(lw, (0, 1))(feats, w)
    m = np.asarray(grid.valid)
    np.testing.assert_allclose(np.asarray(gf2)[m], np.asarray(gf1)[m],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw2), np.asarray(gw1),
                               rtol=1e-3, atol=1e-3)
    return tabs


def test_window_conv_random_grid():
    grid = _random_grid(3, 700, 1024, (24, 32, 32))
    tabs = _check(grid)
    # uniform density: everything should be in-window
    assert int(tabs.esc_count) == 0


@pytest.mark.slow
def test_window_conv_multibatch():
    grid = _random_grid(5, 900, 1280, (16, 24, 24), batch=3)
    _check(grid, cin=6, cout=5, seed=7)


def test_window_conv_escapees():
    """Density discontinuity: a dense z-plane below a 16x-sparser plane
    forces neighbor spans far beyond the window -> escapee path must fire
    and still be exact."""
    shape = (16, 80, 80)
    dense = [(0, 10, y, x) for y in range(80) for x in range(80)]
    sparse = [(0, 11, y, x) for y in range(0, 80, 4) for x in range(0, 80, 4)]
    coords = np.array(sorted(dense + sparse), np.int32)
    cap = 8192
    grid = _grid_from(coords, cap, shape)
    nbr = subm_neighbor_table(grid)
    tabs = build_window_tables(nbr, esc_cap=8192)
    assert int(tabs.esc_count) > 0, "test must exercise the escapee path"
    assert int(tabs.esc_overflow) == 0
    _check(grid, cin=4, cout=4, seed=1, esc_cap=8192)


def test_window_tables_escapee_overflow_counted():
    """Tiny esc_cap: overflow must be counted, never silent."""
    shape = (16, 80, 80)
    dense = [(0, 10, y, x) for y in range(80) for x in range(80)]
    sparse = [(0, 11, y, x) for y in range(0, 80, 4) for x in range(0, 80, 4)]
    coords = np.array(sorted(dense + sparse), np.int32)
    grid = _grid_from(coords, 8192, shape)
    nbr = subm_neighbor_table(grid)
    full = build_window_tables(nbr, esc_cap=8192)
    assert int(full.esc_overflow) == 0  # 8192 is enough -> true count
    true_count = int(full.esc_count)
    tiny = build_window_tables(nbr, esc_cap=128)
    assert true_count > 128
    assert int(tiny.esc_overflow) == true_count - int(tiny.esc_count)
    assert int(tiny.esc_overflow) > 0


@pytest.mark.slow
def test_window_conv_wide_channels_nonblockdiag():
    """Cin=96 (rpack=4, L*Cin=384): exercises the per-sub-slot weight path
    (the block-diagonal form would exceed the kernel VMEM budget)."""
    grid = _random_grid(9, 600, 1024, (16, 24, 24))
    _check(grid, cin=96, cout=96, seed=2, tol=1e-3)


@pytest.mark.slow
def test_fused_bwd_matches_two_pass(monkeypatch):
    """The fused dfeats+dW backward kernel must be numerically identical
    to the two-pass (separate _apply + _pallas_dw) path."""
    import gapro_tpu.sparse.window_conv as wc

    rng = np.random.default_rng(3)
    grid = _random_grid(3, 600, 1024, (24, 24, 24))
    nbr = subm_neighbor_table(grid)
    tabs = build_window_tables(nbr)
    feats = jnp.asarray(rng.standard_normal((1024, 32)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((27, 32, 48)) * 0.1, jnp.float32)

    def loss(ff, ww):
        return jnp.sum(jnp.tanh(
            subm_conv_window(ff, tabs, ww, grid.valid) * 0.1))

    monkeypatch.setenv("GAPRO_WINDOW_FUSED", "1")
    gf1, gw1 = jax.grad(loss, (0, 1))(feats, w)
    monkeypatch.setenv("GAPRO_WINDOW_FUSED", "0")
    gf2, gw2 = jax.grad(loss, (0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(gf1), np.asarray(gf2),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_fused_masks_matches_default(monkeypatch):
    """GAPRO_WINDOW_FUSED_MASKS (per-(dz,dy)-group issue hoisting: one wide
    one-hot compare + one weight matmul shared by the 3 dx offsets) must be
    numerically identical to the default per-offset form on fwd AND both
    gradients — it is a scheduling change, not a math change."""
    import gapro_tpu.sparse.window_conv as wc

    rng = np.random.default_rng(5)
    grid = _random_grid(4, 550, 1024, (20, 24, 24))
    nbr = subm_neighbor_table(grid)
    tabs = build_window_tables(nbr)
    feats = jnp.asarray(rng.standard_normal((1024, 32)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((27, 32, 32)) * 0.1, jnp.float32)

    def outputs():
        y = subm_conv_window(feats, tabs, w, grid.valid)

        def loss(ff, ww):
            return jnp.sum(jnp.tanh(
                subm_conv_window(ff, tabs, ww, grid.valid) * 0.1))

        gf, gw = jax.grad(loss, (0, 1))(feats, w)
        return np.asarray(y), np.asarray(gf), np.asarray(gw)

    monkeypatch.setattr(wc, "_FUSED_MASKS", True)
    fused = outputs()
    monkeypatch.setattr(wc, "_FUSED_MASKS", False)
    plain = outputs()
    for a, b in zip(fused, plain):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_window_conv_wide_channels_two_buffer_path():
    """Channels > 128 select the legacy 2-buffer DMA form (window_conv.py
    `_nbuf_for`) while <= 128 runs the 3-buffer cross-tile pipeline; this
    pins the wide branch's numerics end-to-end (fwd + both grads), which
    otherwise only runs on chip inside the deep UNet levels."""
    grid = _random_grid(11, 600, 1024, (20, 28, 28))
    _check(grid, cin=160, cout=160, seed=3, tol=5e-3)


def test_window_conv_tile_512():
    """Per-level tile geometry (docs/PERF.md tile sweep): tile=512 tables
    must match the plain conv + grads exactly like the default tile."""
    grid = _random_grid(11, 900, 1024, (16, 32, 32))
    rng = np.random.default_rng(3)
    nbr = subm_neighbor_table(grid)
    tabs = build_window_tables(nbr, esc_cap=4096, tile=512)
    assert tabs.tile == 512 and tabs.window == 1024
    cap = grid.capacity
    cin, cout = 8, 16
    feats = jnp.where(grid.valid[:, None],
                      jnp.asarray(rng.normal(size=(cap, cin)).astype(np.float32)), 0.0)
    w = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32))
    want = np.asarray(subm_conv(feats, nbr, w, grid.valid))
    got = np.asarray(subm_conv_window(feats, tabs, w, grid.valid))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    gf1, gw1 = jax.grad(lambda f, ww: jnp.sum(jnp.sin(
        subm_conv(f, nbr, ww, grid.valid))), (0, 1))(feats, w)
    gf2, gw2 = jax.grad(lambda f, ww: jnp.sum(jnp.sin(
        subm_conv_window(f, tabs, ww, grid.valid))), (0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(gf2), np.asarray(gf1),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw2), np.asarray(gw1),
                               rtol=1e-3, atol=1e-3)


def test_plan_tile_schedule(monkeypatch):
    """The plan assigns per-level window tiles from GAPRO_WINDOW_T_SCHED and
    rounds the next level's capacity to ITS tile."""
    import gapro_tpu.sparse.plan as plan_mod

    monkeypatch.setenv("GAPRO_WINDOW_T_SCHED", "256,512")
    grid = _random_grid(7, 6000, 8192, (32, 64, 64))
    plan = plan_mod.build_unet_plan(grid, 3, (1.0, 0.5), use_window=True)
    l0, l1 = plan.levels[0], plan.levels[1]
    assert l0.wtab is not None and l0.wtab.tile == 256
    # level 1 stays at the eligibility floor: 512-multiple cap, tile 512
    assert l1.grid.capacity == 8192 and l1.wtab is not None
    assert l1.wtab.tile == 512 and l1.wtab.window == 1024
    # below the 8192 floor the schedule is ignored (default tile rounding)
    tiny = plan_mod.build_unet_plan(_random_grid(3, 400, 1024, (16, 16, 16)),
                                    2, (0.3,), use_window=True)
    assert tiny.levels[1].grid.capacity == 512  # 0.3*1024 -> 256-rounded
