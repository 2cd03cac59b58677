"""Point-cloud -> voxel batch preparation (device-side, jitted).

The reference voxelizes on CPU in the DataLoader collate
(ISBNet/isbnet/data/custom.py:295-296) and scatters features on GPU.  Here
the whole step runs on device: voxelize (sort-unique), mean-pool features,
first-point labels, and U-Net plan construction — one jit per (point
capacity, voxel capacity, level count) bucket.

Spatial extents are static generous bounds (only used for key packing and
neighbor bounds checks); actual scene extents just have to fit inside.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.bucketing import next_bucket
from ..core.segment import compact_unique, segment_count
from ..ops.voxelize import voxel_feats_mean, voxel_gather_first, voxelize
from ..sparse.plan import build_unet_plan
from ..sparse.tensor import SparseGrid
from .isbnet import VoxelBatch

# generous static bounds: z < 1024, y/x < 16384 (keys stay within int32)
EXTENTS = (1024, 16384, 16384)


class PointBatch(NamedTuple):
    """Padded point-level arrays (numpy or jnp)."""

    coords: jax.Array  # [N, 4] int32 (batch, z, y, x)
    coords_float: jax.Array  # [N, 3]
    feats: jax.Array  # [N, 3] rgb
    spp: jax.Array  # [N] int64/int32 raw superpoint ids (globally offset)
    valid: jax.Array  # [N]
    semantic: jax.Array  # [N] int32 (-100 ignore)
    instance: jax.Array  # [N] int32 (-100 ignore)
    prob: jax.Array  # [N]
    mu: jax.Array  # [N]
    var: jax.Array  # [N]


def points_to_batch_np(scenes, voxel_scale=50, n_cap=None):
    """Host collate: list of per-scene dicts -> padded PointBatch (numpy).

    Each scene dict: xyz, rgb, spp, and optional semantic/instance/prob/mu/var.
    Mirrors the reference collate (custom.py:218-316): concatenate scenes,
    batch index in coords[:, 0], spp ids offset per scene, coords quantized
    int(xyz * scale) shifted to min 0 per scene.
    """
    coords_l, cf_l, rgb_l, spp_l, sem_l, inst_l = [], [], [], [], [], []
    prob_l, mu_l, var_l = [], [], []
    spp_offset = 0
    inst_offset = 0
    for b, sc in enumerate(scenes):
        xyz = np.asarray(sc["xyz"], np.float32)
        n = len(xyz)
        if "xyz_scaled" in sc:  # augmentation already scaled/shifted
            c = np.floor(np.asarray(sc["xyz_scaled"], np.float64)).astype(np.int64)
        else:
            c = np.floor(xyz * voxel_scale).astype(np.int64)
        c -= c.min(0)
        coords_l.append(
            np.concatenate([np.full((n, 1), b, np.int64), c[:, ::-1]], axis=1)  # (b, z, y, x)
        )
        cf_l.append(xyz)
        rgb_l.append(np.asarray(sc["rgb"], np.float32))
        spp = np.asarray(sc["spp"])
        _, spp_c = np.unique(spp, return_inverse=True)
        spp_l.append(spp_c + spp_offset)
        spp_offset += spp_c.max() + 1
        sem = np.asarray(sc.get("semantic", np.full(n, -100)), np.int32)
        inst = np.asarray(sc.get("instance", np.full(n, -100)), np.int32).copy()
        if inst.max() >= 0:
            inst[inst >= 0] += inst_offset
            inst_offset = int(inst.max()) + 1
        sem_l.append(sem)
        inst_l.append(inst)
        prob_l.append(np.asarray(sc.get("prob", np.ones(n)), np.float32))
        mu_l.append(np.asarray(sc.get("mu", np.full(n, -100.0)), np.float32))
        var_l.append(np.asarray(sc.get("var", np.full(n, -100.0)), np.float32))

    def cat(lst):
        return np.concatenate(lst, axis=0)

    coords = cat(coords_l)
    n_total = len(coords)
    cap = n_cap or next_bucket(n_total)
    pad = cap - n_total

    def padded(x, fill=0):
        w = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x, w, constant_values=fill)

    return PointBatch(
        coords=padded(coords, -1).astype(np.int32),
        coords_float=padded(cat(cf_l)),
        feats=padded(cat(rgb_l)),
        spp=padded(cat(spp_l), -1).astype(np.int32),
        valid=np.arange(cap) < n_total,
        semantic=padded(cat(sem_l), -100),
        instance=padded(cat(inst_l), -100),
        prob=padded(cat(prob_l)),
        mu=padded(cat(mu_l), -100.0),
        var=padded(cat(var_l), -100.0),
    )


class PreparedBatch(NamedTuple):
    batch: VoxelBatch
    point2voxel: jax.Array  # [N] for devoxelization
    voxel_semantic: jax.Array  # [V]
    voxel_instance: jax.Array
    voxel_prob: jax.Array
    voxel_mu: jax.Array
    voxel_var: jax.Array
    voxel_rgb: jax.Array  # [V, 3]


def prepare_voxel_batch(
    pb: PointBatch,
    voxel_cap: int,
    batch_size: int,
    num_levels: int = 7,
    spp_cap: int = 8192,
    shrink: "float | tuple" = 0.5,
) -> PreparedBatch:
    # resolve the window-conv env flag OUTSIDE the jitted trace so toggling
    # GAPRO_WINDOW_CONV mid-process invalidates the cached program (it
    # becomes a static arg -> distinct compilation)
    from ..sparse.window_conv import window_conv_enabled

    if isinstance(shrink, list):
        shrink = tuple(shrink)  # per-level schedule; static arg -> hashable
    return _prepare_voxel_batch_jit(pb, voxel_cap, batch_size, num_levels,
                                    spp_cap, shrink, window_conv_enabled())


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6))
def _prepare_voxel_batch_jit(
    pb: PointBatch,
    voxel_cap: int,
    batch_size: int,
    num_levels: int,
    spp_cap: int,
    shrink: float,
    use_window: bool,
) -> PreparedBatch:
    maps = voxelize(pb.coords, EXTENTS, voxel_cap, valid=pb.valid)
    grid = SparseGrid(
        coords=maps.voxel_coords,
        valid=maps.valid_voxel,
        num_voxels=maps.num_voxels,
        spatial_shape=EXTENTS,
        batch_size=batch_size,
    )
    plan = build_unet_plan(grid, num_levels, shrink, use_window=use_window)

    rgb = voxel_feats_mean(pb.feats, maps.point2voxel, voxel_cap)
    coords_float = voxel_feats_mean(pb.coords_float, maps.point2voxel, voxel_cap)
    sem = voxel_gather_first(pb.semantic, maps)
    inst = voxel_gather_first(pb.instance, maps)
    prob = voxel_gather_first(pb.prob, maps)
    mu = voxel_gather_first(pb.mu, maps)
    var = voxel_gather_first(pb.var, maps)
    raw_spp = voxel_gather_first(pb.spp, maps)
    sem = jnp.where(maps.valid_voxel, sem, -100)
    inst = jnp.where(maps.valid_voxel, inst, -100)
    _, spp_compact, _ = compact_unique(raw_spp, spp_cap, valid=maps.valid_voxel)

    batch = VoxelBatch(
        feats=rgb,
        coords_float=coords_float,
        batch_idx=jnp.maximum(maps.voxel_coords[:, 0], 0),
        valid=maps.valid_voxel,
        spp=spp_compact,
        plan=plan,
        batch_size=batch_size,
        n_spp=spp_cap,
        vox_npoints=segment_count(maps.point2voxel, voxel_cap),
    )
    return PreparedBatch(
        batch=batch,
        point2voxel=maps.point2voxel,
        voxel_semantic=sem,
        voxel_instance=inst,
        voxel_prob=prob,
        voxel_mu=mu,
        voxel_var=var,
        voxel_rgb=rgb,
    )


# --------------------------------------------------------------------------- #
# Packed host->device upload: the remote-relay TPU pays ~30 ms latency per
# transfer and low per-stream bandwidth, so uploading PointBatch's ~15
# arrays separately costs seconds per full scene (measured 8 s/scene in
# e2e inference). One [N, 17] float32 buffer carries everything exactly
# (ints < 2^24 are exact in f32; sentinels -100 exact).

_PACK_COLS = 17


def pack_point_batch_np(pb: PointBatch) -> np.ndarray:
    """Host: PointBatch (numpy) -> one [N, 17] float32 upload buffer."""
    n = pb.coords.shape[0]
    buf = np.empty((n, _PACK_COLS), np.float32)
    buf[:, 0:4] = pb.coords
    buf[:, 4:7] = pb.coords_float
    buf[:, 7:10] = pb.feats
    buf[:, 10] = pb.spp
    buf[:, 11] = pb.valid
    buf[:, 12] = pb.semantic
    buf[:, 13] = pb.instance
    buf[:, 14] = pb.prob
    buf[:, 15] = pb.mu
    buf[:, 16] = pb.var
    return buf


def unpack_point_batch(buf: jax.Array) -> PointBatch:
    """Device: [N, 17] buffer -> PointBatch (slices + casts; jit-safe)."""
    return PointBatch(
        coords=buf[:, 0:4].astype(jnp.int32),
        coords_float=buf[:, 4:7],
        feats=buf[:, 7:10],
        spp=buf[:, 10].astype(jnp.int32),
        valid=buf[:, 11] > 0.5,
        semantic=buf[:, 12].astype(jnp.int32),
        instance=buf[:, 13].astype(jnp.int32),
        prob=buf[:, 14],
        mu=buf[:, 15],
        var=buf[:, 16],
    )


def upload_point_batch(pb_np: PointBatch) -> PointBatch:
    """ONE H2D transfer instead of ~15 (see module note)."""
    return unpack_point_batch(jnp.asarray(pack_point_batch_np(pb_np)))
