"""Box -> pseudo-mask GP labeling pipeline (the reference's gen_ps core).

Reimplements ``gen_pseudo_label_gaussian_process``
(gapro/gen_ps_utils.py:293-482) with a TPU-first execution split:

  device (jit):  point-in-box occupancy over all points x boxes, superpoint
                 mean-pooling of coords/features/occupancy (segment ops);
  host (numpy):  the cheap serial ambiguity-resolution bookkeeping — whose
                 set of GP fits is *statically* determined (GP outputs only
                 affect label writes, never which pairs get fit: train sets
                 are one-box superpoints, intersections are multi-box ones);
  device (vmap): ALL GP fits batched per size-bucket in a few `fit_gp_batch`
                 calls — replacing the reference's serial per-pair loop of
                 50-iteration gpytorch fits, which is the throughput
                 bottleneck this rebuild's bench targets.

Write-back order replicates the reference loop exactly, so labels match the
sequential semantics (overwrite when a later pair is more confident).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.bucketing import next_bucket
from ..core.segment import compact_unique, segment_mean
from ..gp import fit_gp_batch
from .boxes import box_giou_cross, is_box1_in_box2


@dataclass(frozen=True)
class LabelerConfig:
    instance_classes: int = 18
    ground_h: float = 0.1
    training_iter: int = 50
    lr: float = 0.1
    thresh_spp_occu: float = 0.999
    box_margin: float = 0.005
    in_box_offset: float = 0.1
    iou_skip: float = 0.6
    iou_overlap_min: float = 1e-4
    max_train: int = 512  # cap on GP train size (subsampled beyond this)
    max_test: int = 1024
    # inducing-point cap (sparse-SVGP approximation; the Cholesky is O(M^3)
    # while the ELBO sums over all train points). Measured on synthetic
    # scenes: mIoU identical down to 128 at several x the throughput.
    n_inducing: int = 128


@partial(jax.jit, static_argnums=(2, 3, 4, 6))
def _fit_gp_batch_indexed(ibuf, feats, tb, qb, iters, lr, n_inducing):
    """GP fit batch whose train/test ROWS are gathered ON DEVICE from the
    device-resident pooled superpoint features (round 5).

    The round-4 profile put occ_fetch + gp_fetch at ~75% of a bench pass:
    the host fetched [S, 3+Dx+B] f32 per scene only to immediately
    threshold the occupancy and re-upload gathered feature rows for the
    fits. Keeping the pooled feats on device turns the occupancy fetch
    into a bit-packed mask (~40x smaller) and the fit upload into one
    small int32 index buffer per group.

    ``ibuf`` is [B, tb+qb] int32: train slots carry sign(y) * (row + 1)
    (0 = padding; the reference labels box1 rows -1, box2 rows +1,
    gen_ps_utils.py:398-400), test slots carry row + 1. ``feats`` is a
    tuple of [S_i, D] device arrays (one per scene in the window); rows
    are indexed into their concatenation."""
    flat = feats[0] if len(feats) == 1 else jnp.concatenate(feats, axis=0)
    d = flat.shape[1]
    tr = ibuf[:, :tb]
    te = ibuf[:, tb:]
    tm = tr != 0
    ty = jnp.where(tr < 0, -1.0, 1.0).astype(jnp.float32)
    ti = jnp.maximum(jnp.abs(tr) - 1, 0)
    tx = jnp.take(flat, ti.reshape(-1), axis=0).reshape(ti.shape + (d,))
    qm = te != 0
    qi = jnp.maximum(te - 1, 0)
    qx = jnp.take(flat, qi.reshape(-1), axis=0).reshape(qi.shape + (d,))
    r = fit_gp_batch(tx, ty, tm, qx, qm, iters, lr, n_inducing)
    # labels (probs >= 0.5) and conf (max(p, 1-p)) are recomputed on host
    # from the SAME f32 probs — bit-exact — so the D2H ships 3 rows not 5
    return jnp.stack([r.probs, r.mu, r.var])


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 6))
def _fit_gp_batch_packed(buf, tb, qb, d, iters, lr, n_inducing):
    """One packed H2D upload + one packed D2H fetch per group: transfers
    through the remote relay cost ~30 ms latency each regardless of size
    (docs/PERF.md), so the host buffer carries [tx | ty | tm | qx | qm]
    flattened per lane and the result is one [3, B, Q] array
    (probs, mu, var — labels/conf recomputed on host bit-exactly).
    Fallback path for host-resident (numpy) feats; the streaming sweep
    uses `_fit_gp_batch_indexed`."""
    B = buf.shape[0]
    o1 = tb * d
    o2 = o1 + tb
    o3 = o2 + tb
    o4 = o3 + qb * d
    tx = buf[:, :o1].reshape(B, tb, d)
    ty = buf[:, o1:o2]
    tm = buf[:, o2:o3] > 0.5
    qx = buf[:, o3:o4].reshape(B, qb, d)
    qm = buf[:, o4:] > 0.5
    r = fit_gp_batch(tx, ty, tm, qx, qm, iters, lr, n_inducing)
    return jnp.stack([r.probs, r.mu, r.var])


class _GPJob(NamedTuple):
    b1: int
    b2: int
    b1_inds: np.ndarray
    b2_inds: np.ndarray
    intersect_inds: np.ndarray
    scene: int = 0  # index into the feats list for cross-scene batched fits


def _pack_bits_u8(bits):
    """[S, B] bool -> [S, ceil(B/8)] uint8, little bit order (bit k of byte
    j = column 8j+k; the host inverse is np.unpackbits(bitorder='little'))."""
    s, b = bits.shape
    nb = (b + 7) // 8
    if nb * 8 != b:
        bits = jnp.pad(bits, ((0, 0), (0, nb * 8 - b)))
    w = jnp.left_shift(jnp.int32(1), jnp.arange(8, dtype=jnp.int32))
    return (bits.reshape(s, nb, 8).astype(jnp.int32) * w).sum(-1).astype(jnp.uint8)


def _unpack_occ(occ_u8: np.ndarray, n_boxes: int) -> np.ndarray:
    """Host inverse of `_pack_bits_u8`: [S, nb] uint8 -> [S, n_boxes] bool."""
    return np.unpackbits(occ_u8, axis=1, bitorder="little")[:, :n_boxes] \
        .astype(bool)


@partial(jax.jit, static_argnums=(1, 2, 3, 5, 6, 7, 8))
def _occupancy_and_pool(buf, n_cap, d_extra, n_spps_cap, margin,
                        rgb_packed, b_cap, xyz_in_feats, thresh):
    """Device stage: [N,B] occupancy + superpoint mean pooling (padded).

    ONE flat H2D upload carrying points AND boxes ([n_cap*cols + b_cap*6]
    f32: coords | extra_feats | spp rows, then box rows; padding rows carry
    spp = -1, so no separate valid column). Returns TWO device results:

      feats [S, D_gp] f32 — the pooled GP feature matrix, which STAYS ON
        DEVICE (round 5): the GP fits gather their train/test rows from it
        by index (`_fit_gp_batch_indexed`), so it is never fetched on the
        hot path;
      occ_bits [S, ceil(B/8)] uint8 — the occupancy thresholded AT
        ``thresh`` on device (the host immediately binarized the f32 means
        anyway, reference gen_ps_utils.py:373) and bit-packed. This is the
        ONLY per-scene D2H payload of the sweep's enumerate step — ~40x
        smaller than the round-4 [S, 3+Dx+B] f32 fetch on a
        latency+bandwidth-bound link.

    When the GP features are xyz-prefixed (the standard xyz+rgb path), the
    xyz columns are NOT re-sent: Dx = D - 3 and the device reassembles
    feats as [coords_spp | extra_spp] (segment_mean is columnwise, so this
    is bit-exact) — a ~27% H2D cut on the tunnel-bound submit phase.

    `rgb_packed`: the three rgb columns arrive as ONE f32 column holding
    r + 256 g + 65536 b of the uint8-grid color (<= 2^24 - 1, exact in
    f32; ScanNet rgb is uint8-derived, prepare_data_inst.py) — point rows
    are [N, 5] instead of [N, 7], a further ~29% H2D cut. The device
    reconstructs u/127.5 - 1 with the same f32 ops the prep used, so
    pooling inputs are bit-identical (submit_scene verifies exactness on
    host and falls back to the flat layout otherwise)."""
    cols = 5 if rgb_packed else 3 + d_extra + 1
    points_buf = buf[: n_cap * cols].reshape(n_cap, cols)
    boxes = buf[n_cap * cols:].reshape(b_cap, 6)
    coords = points_buf[:, :3]
    if rgb_packed:
        assert d_extra == 3
        packed = points_buf[:, 3].astype(jnp.int32)
        u = jnp.stack([packed & 255, (packed >> 8) & 255, packed >> 16], 1)
        # 256-entry LUT computed on HOST with the same numpy f32 ops the
        # data prep used — XLA lowers f32 division to reciprocal-multiply
        # (1 ulp off numpy), so an in-graph u/127.5 - 1 would NOT be
        # bit-identical to the flat layout; the table gather is exact
        lut = jnp.asarray(np.arange(256, dtype=np.float32)
                          / np.float32(127.5) - np.float32(1.0))
        extra = jnp.take(lut, u, axis=0)
        spp_col = 4
    else:
        extra = points_buf[:, 3 : 3 + d_extra]
        spp_col = 3 + d_extra
    spp_inverse = points_buf[:, spp_col].astype(jnp.int32)
    valid = spp_inverse >= 0
    inside = (
        jnp.all(coords[:, None, :] >= boxes[None, :, :3] - margin, axis=-1)
        & jnp.all(coords[:, None, :] <= boxes[None, :, 3:] + margin, axis=-1)
        & valid[:, None]
    )
    spp_inverse = jnp.where(valid, spp_inverse, -1)
    n_spp = n_spps_cap  # static
    extra_spp = segment_mean(extra, spp_inverse, n_spp)
    if xyz_in_feats:
        coords_spp = segment_mean(coords, spp_inverse, n_spp)
        feats = jnp.concatenate([coords_spp, extra_spp], axis=1)
    else:
        feats = extra_spp
    occ_spp = segment_mean(inside.astype(jnp.float32), spp_inverse, n_spp)
    occ_bits = _pack_bits_u8(occ_spp >= jnp.float32(thresh))
    return feats, occ_bits


@partial(jax.jit, static_argnums=(1, 2, 3, 5, 6, 7, 8))
def _occupancy_and_pool_vmapped(bufs, n_cap, d_extra, n_spps_cap, margin,
                                rgb_packed, b_cap, xyz_in_feats, thresh):
    """[K, L] window of same-shape scene payloads -> ([K, S, D_gp],
    [K, S, nb]).

    One upload + one program + one fetch for a whole same-shape window
    group (see submit_scenes_batched)."""
    return jax.vmap(
        lambda b: _occupancy_and_pool(b, n_cap, d_extra, n_spps_cap,
                                      margin, rgb_packed, b_cap,
                                      xyz_in_feats, thresh)
    )(bufs)


# cumulative overflow counters ("no silent caps"): GP jobs whose train rows
# were subsampled beyond max_train / whose intersection was truncated beyond
# max_test. Read by tools/gen_ps.py for the sweep summary; reset with
# reset_overflow_stats().
OVERFLOW_STATS = {"gp_train_subsampled": 0, "gp_test_truncated": 0}

# wall-clock accumulators for the windowed sweep's phases (seconds) — read
# by bench.py / tools/gen_ps.py to localize regressions (VERDICT r2 #1:
# the driver-vs-local throughput gap needed per-phase attribution)
PHASE_STATS = {"submit": 0.0, "occ_fetch": 0.0, "enumerate": 0.0,
               "gp_submit": 0.0, "gp_fetch": 0.0, "writeback": 0.0}


def reset_overflow_stats():
    for k in OVERFLOW_STATS:
        OVERFLOW_STATS[k] = 0
    for k in PHASE_STATS:
        PHASE_STATS[k] = 0.0


def _fit_jobs_batched(jobs, feats_spp, cfg: LabelerConfig, device=None):
    """Run all GP jobs with per-bucket vmapped fits. Returns list of results
    aligned with `jobs`: (probs, probs_new, labels, mu, var) numpy arrays.

    `feats_spp` is either one [S, D] array or a list indexed by job.scene —
    the sweep batches GP fits across a WINDOW of scenes into shared buckets
    (fewer device dispatches / relay round trips per scene).

    `device` may be one device or a list — fit groups round-robin across a
    list (the mesh path of the SURVEY §2.5 showcase: GP groups are
    embarrassingly parallel)."""
    return _fit_jobs_fetch(_fit_jobs_submit(jobs, feats_spp, cfg, device))


def _job_buckets(jobs, cfg: LabelerConfig):
    """Group job indices by (train_bucket, test_bucket); coarse pow2 buckets
    keep the number of device dispatches (and compiled programs) small.

    GAPRO_GP_ONE_BUCKET=1 pads every job to one (max_train-bucket,
    max_test-bucket) shape: ONE device program per window instead of one
    per bucket combo — more padded FLOPs, fewer dispatch chains.
    DECIDED OFF (round 5): a same-relay-window A/B (4 alternating rounds,
    16 scenes) measured it consistently slower — gp_fetch 0.76-0.88 vs
    0.52-0.64 s/pass, best 7.6 vs 12.3 scenes/s — the padded device
    compute outweighs the dispatch savings at every relay state."""
    groups = {}
    one_bucket = os.environ.get("GAPRO_GP_ONE_BUCKET", "0") == "1"
    for j, job in enumerate(jobs):
        t = min(len(job.b1_inds) + len(job.b2_inds), cfg.max_train)
        q = min(len(job.intersect_inds), cfg.max_test)
        if one_bucket:
            key = (next_bucket(cfg.max_train, min_size=256, granularity=1),
                   next_bucket(cfg.max_test, min_size=128, granularity=1))
        else:
            # very coarse buckets: each group costs two relay round trips
            # (~30 ms latency each), which outweighs padding waste — the
            # per-lane compute is bounded by the inducing cap anyway
            key = (next_bucket(t, min_size=256, granularity=1),
                   next_bucket(q, min_size=128, granularity=1))
        groups.setdefault(key, []).append(j)
    return groups


def _count_overflows(jobs, cfg: LabelerConfig):
    n_sub = sum(1 for j in jobs
                if len(j.b1_inds) + len(j.b2_inds) > cfg.max_train)
    n_trunc = sum(1 for j in jobs if len(j.intersect_inds) > cfg.max_test)
    if n_sub or n_trunc:
        OVERFLOW_STATS["gp_train_subsampled"] += n_sub
        OVERFLOW_STATS["gp_test_truncated"] += n_trunc
        import logging

        logging.getLogger(__name__).info(
            "GP caps hit: %d/%d jobs train-subsampled (>%d), %d truncated (>%d)",
            n_sub, len(jobs), cfg.max_train, n_trunc, cfg.max_test)


def _subsampled_job_rows(job, tb, qb, j):
    """Shared per-job row selection: proportional train subsample beyond the
    cap, test truncation, and the inducing shuffle (the first n_inducing
    rows become the inducing set, so they must be a random mix of both
    boxes). The rng is seeded PER JOB (by its position in the jobs list),
    never shared across jobs: draws are then independent of group iteration
    order, so the host-packed and device-indexed paths — and any device
    placement of the scenes — produce bit-identical fits."""
    rng = np.random.default_rng(j)
    b1i, b2i = job.b1_inds, job.b2_inds
    if len(b1i) + len(b2i) > tb:  # cap: subsample proportionally
        keep1 = max(1, int(tb * len(b1i) / (len(b1i) + len(b2i))))
        keep2 = tb - keep1
        b1i = rng.choice(b1i, size=min(keep1, len(b1i)), replace=False)
        b2i = rng.choice(b2i, size=min(keep2, len(b2i)), replace=False)
    qi = job.intersect_inds
    if len(qi) > qb:
        qi = qi[:qb]
    perm = rng.permutation(len(b1i) + len(b2i))
    return b1i, b2i, qi, perm


def _fit_jobs_submit(jobs, feats_spp, cfg: LabelerConfig, device=None):
    """First half of `_fit_jobs_batched`: pack + dispatch every fit group
    WITHOUT blocking on results. Returns an opaque pending state for
    `_fit_jobs_fetch` — the stream keeps one window's fits in flight while
    it enumerates the next window (the device never idles between
    windows).

    `feats_spp` entries may be DEVICE arrays (the hot path: rows are
    gathered on device by `_fit_gp_batch_indexed`, and only a small int32
    index buffer is uploaded per group) or host numpy arrays (fallback:
    rows are packed on host into one flat f32 buffer per group)."""
    if not jobs:
        return [], 0
    feats_list = (list(feats_spp) if isinstance(feats_spp, (list, tuple))
                  else [feats_spp])
    _count_overflows(jobs, cfg)
    if not isinstance(feats_list[0], np.ndarray):
        return _fit_jobs_submit_indexed(jobs, feats_list, cfg)
    d = feats_list[0].shape[1]
    groups = _job_buckets(jobs, cfg)

    dev_list = (list(device) if isinstance(device, (list, tuple))
                else ([device] if device is not None else [None]))
    pending = []
    import time as _time

    t0 = _time.perf_counter()
    for gi, ((tb, qb), idxs) in enumerate(groups.items()):
        # pad the batch axis to a bucket too: fit_gp_batch compiles per
        # (B, tb, qb) and compiles are expensive (remote relay); dummy
        # lanes are fully masked and their results discarded
        B = next_bucket(len(idxs), min_size=4)
        buf = np.zeros((B, tb * (d + 2) + qb * (d + 1)), np.float32)
        tx = buf[:, : tb * d].reshape(B, tb, d)
        ty = buf[:, tb * d : tb * (d + 1)].reshape(B, tb)
        ty[:] = 1.0
        tm = buf[:, tb * (d + 1) : tb * (d + 2)].reshape(B, tb)
        qx = buf[:, tb * (d + 2) : tb * (d + 2) + qb * d].reshape(B, qb, d)
        qm = buf[:, tb * (d + 2) + qb * d :].reshape(B, qb)
        for bi, j in enumerate(idxs):
            job = jobs[j]
            b1i, b2i, qi, perm = _subsampled_job_rows(job, tb, qb, j)
            t = len(b1i) + len(b2i)
            feats_j = feats_list[job.scene]
            tx[bi, :t] = feats_j[np.concatenate([b1i, b2i])][perm]
            yrow = np.ones(t, np.float32)
            yrow[: len(b1i)] = -1.0
            ty[bi, :t] = yrow[perm]
            tm[bi, :t] = True
            qx[bi, : len(qi)] = feats_j[qi]
            qm[bi, : len(qi)] = True
        # submit without blocking; fetch after ALL groups are in flight
        dev = dev_list[gi % len(dev_list)]
        dev_buf = jnp.asarray(buf) if dev is None else jax.device_put(buf, dev)
        nqs = [min(len(jobs[j].intersect_inds), qb) for j in idxs]
        pending.append((idxs, nqs, _fit_gp_batch_packed(
            dev_buf,
            tb,
            qb,
            d,
            cfg.training_iter,
            jnp.float32(cfg.lr),
            min(cfg.n_inducing, tb) if cfg.n_inducing else None,
        )))

    PHASE_STATS["gp_submit"] += _time.perf_counter() - t0
    return pending, len(jobs)


def _fit_jobs_submit_indexed(jobs, feats_list, cfg: LabelerConfig):
    """Index-path submit: feats stay device-resident, one small int32 index
    buffer uploaded per fit group (see `_fit_gp_batch_indexed`).

    Groups are keyed by (train_bucket, test_bucket, device-of-scene): a
    group's gather source is the concatenation of the feats of ALL scenes
    living on that device, so every fit runs where its scene's occupancy
    ran (round-robin over the mesh at the scene level already spreads the
    load; no cross-device transfers)."""
    import time as _time

    t0 = _time.perf_counter()
    # per-device scene lists + row offsets into the per-device concat
    dev_of_scene = [next(iter(f.devices())) for f in feats_list]
    dev_scenes: dict = {}
    for si, dev in enumerate(dev_of_scene):
        dev_scenes.setdefault(dev, []).append(si)
    offsets = {}
    for dev, sis in dev_scenes.items():
        off = 0
        for si in sis:
            offsets[si] = off
            off += feats_list[si].shape[0]

    groups = {}
    for (tb, qb), idxs in _job_buckets(jobs, cfg).items():
        for j in idxs:
            key = (tb, qb, dev_of_scene[jobs[j].scene])
            groups.setdefault(key, []).append(j)

    pending = []
    for (tb, qb, dev), idxs in groups.items():
        B = next_bucket(len(idxs), min_size=4)
        ibuf = np.zeros((B, tb + qb), np.int32)
        for bi, j in enumerate(idxs):
            job = jobs[j]
            b1i, b2i, qi, perm = _subsampled_job_rows(job, tb, qb, j)
            t = len(b1i) + len(b2i)
            base = offsets[job.scene]
            rows = base + np.concatenate([b1i, b2i]).astype(np.int64)
            sign = np.ones(t, np.int64)
            sign[: len(b1i)] = -1
            ibuf[bi, :t] = ((rows + 1) * sign)[perm]
            ibuf[bi, tb : tb + len(qi)] = base + np.asarray(qi) + 1
        feats_tuple = tuple(feats_list[si] for si in dev_scenes[dev])
        nqs = [min(len(jobs[j].intersect_inds), qb) for j in idxs]
        pending.append((idxs, nqs, _fit_gp_batch_indexed(
            jax.device_put(ibuf, dev),
            feats_tuple,
            tb,
            qb,
            cfg.training_iter,
            jnp.float32(cfg.lr),
            min(cfg.n_inducing, tb) if cfg.n_inducing else None,
        )))
    PHASE_STATS["gp_submit"] += _time.perf_counter() - t0
    return pending, len(jobs)


def _fit_jobs_device_results(state):
    """Device arrays of an in-flight `_fit_jobs_submit` state, for callers
    that merge the fetch with other transfers into ONE jax.device_get
    (every relay round trip costs ~30 ms of latency regardless of size)."""
    return [dev_res for _, _, dev_res in state[0]]


def _fit_jobs_fetch(state, fetched=None):
    """Second half of `_fit_jobs_batched`: block on each in-flight group's
    packed result and unpack per-job slices. `fetched` supplies the
    already-transferred host copies of `_fit_jobs_device_results` (the
    stream merges this fetch with the next window's occupancy fetch)."""
    pending, n_jobs = state
    import time as _time

    results = [None] * n_jobs
    t1 = _time.perf_counter()
    if fetched is None:
        # one batched device_get for ALL groups (transfers overlap) instead
        # of a serial per-group np.asarray
        fetched = jax.device_get([dev_res for _, _, dev_res in pending])
    for (idxs, nqs, _), res in zip(pending, fetched):
        probs, mu, var = res
        # host-side finalize on the fetched f32 probs — identical ops to
        # the former device version, so bit-exact, and the D2H payload
        # drops from 5 to 3 rows
        labels = probs >= 0.5
        probs_new = np.where(labels, probs, np.float32(1.0) - probs)
        for bi, (j, nq) in enumerate(zip(idxs, nqs)):
            results[j] = (
                probs[bi, :nq],
                probs_new[bi, :nq],
                labels[bi, :nq],
                mu[bi, :nq],
                var[bi, :nq],
            )
    PHASE_STATS["gp_fetch"] += _time.perf_counter() - t1
    return results


def generate_scene_labels(
    coords,
    gp_feats,
    spp,
    instance_cls,
    instance_box,
    instance_box_volume,
    wall_box=None,
    wall_box_volume=None,
    cfg: LabelerConfig = LabelerConfig(),
):
    """Generate (sem, inst, prob, mu, var) pseudo labels for one scene.

    Args (numpy):
      coords: [N,3] axis-aligned xyz.
      gp_feats: [N,D] GP input features (xyz+rgb, or deep mask features for
        self-training).
      spp: [N] superpoint ids (arbitrary ints).
      instance_cls/box/volume: foreground boxes from `instance_info`.
      wall_box/volume: optional background wall boxes.

    Returns per-point numpy arrays:
      sem [N] int32 (-100 ignore, class ids, instance_classes=background),
      inst [N] int32 (-100 ignore), prob [N] f32, and per-*superpoint*
      mu/var arrays gathered to points is NOT done for mu/var — matching the
      reference, mu/var stay per-superpoint sized in the saved tuple? No:
      the reference returns spp-level mu/var (gen_ps_utils.py:482 returns
      ps_mu_label over superpoints, saved as-is). We return (sem, inst,
      prob, mu_spp, var_spp, spp_inverse) so callers can decide; the CLI
      saves point-level (sem, inst, prob) and spp-level (mu, var).
    """
    handle = submit_scene(coords, gp_feats, spp, instance_cls, instance_box,
                          instance_box_volume, wall_box, wall_box_volume, cfg)
    return resolve_scene(handle, cfg)


class _SceneHandle(NamedTuple):
    feats: jax.Array | None  # [S, D_gp] device-resident pooled GP feats
    occ_bits: jax.Array | None  # in-flight [S, ceil(B/8)] uint8 occupancy
    spp_inverse: np.ndarray
    n_spps: int
    n_boxes: int
    n_fg: int
    boxes: np.ndarray
    boxes_cls: np.ndarray
    boxes_volume: np.ndarray
    # window-batched submit (submit_scenes_batched): the scene's occupancy
    # is lane `lane` of the shared [K, S, nb] device result instead of
    # its own array — ONE H2D put + ONE D2H fetch per same-shape window
    # group rather than per scene (the tunnel charges ~30 ms latency per
    # transfer regardless of size, docs/PERF.md)
    occ_batch: jax.Array | None = None
    lane: int = 0


def _try_pack_rgb(rgb: np.ndarray):
    """[N, 3] f32 rgb -> [N] f32 (r + 256 g + 65536 b) iff the colors sit
    exactly on the uint8 grid u/127.5 - 1 (true for ScanNet data prepared
    with f32 math — tools/prepare_scannet.py:65 — and the synthetic
    fixtures); returns None when any value fails byte-exact round-trip,
    falling back to the flat 3-column layout. GAPRO_PACK_RGB=0 disables."""
    u = np.rint((rgb + np.float32(1.0)) * np.float32(127.5))
    if u.min() < 0 or u.max() > 255:
        return None
    recon = u / np.float32(127.5) - np.float32(1.0)
    if not np.array_equal(recon, rgb):
        return None
    return u[:, 0] + np.float32(256.0) * u[:, 1] + np.float32(65536.0) * u[:, 2]


class _PackedScene(NamedTuple):
    """Host-side packed submit payload (one flat f32 upload per scene)."""

    flat: np.ndarray
    n_cap: int
    d_extra: int
    n_spp_cap: int
    rgb_packed: bool
    b_cap: int
    spp_inverse: np.ndarray
    n_spps: int
    n_boxes: int
    n_fg: int
    d_feat: int
    xyz_in_feats: bool
    boxes: np.ndarray
    boxes_cls: np.ndarray
    boxes_volume: np.ndarray

    def shape_key(self, margin):
        return (len(self.flat), self.n_cap, self.d_extra, self.n_spp_cap,
                float(margin), self.rgb_packed, self.b_cap,
                self.xyz_in_feats)


def _pack_scene(coords, gp_feats, spp, instance_cls, instance_box,
                instance_box_volume, wall_box=None, wall_box_volume=None,
                cfg: LabelerConfig = LabelerConfig()) -> _PackedScene:
    """Host half of submit_scene: box assembly + bucketed flat packing."""
    coords = np.asarray(coords, np.float32)
    gp_feats = np.asarray(gp_feats, np.float32)
    n_points = len(coords)
    n_fg = len(instance_box)
    ccls = cfg.instance_classes

    # ---- assemble box set: instances + walls + floor (background classes) --
    mn, mx = coords.min(0), coords.max(0)
    fbox = np.array([mn[0], mn[1], mn[2], mx[0], mx[1], mn[2] + cfg.ground_h], np.float32)
    fvol = np.prod(np.clip(fbox[3:] - fbox[:3], 1e-3, None))
    if wall_box is not None and len(wall_box) > 0:
        boxes = np.concatenate([instance_box, wall_box, fbox[None]], 0)
        boxes_cls = np.concatenate(
            [instance_cls, np.full(len(wall_box) + 1, ccls, instance_cls.dtype)], 0
        )
        boxes_volume = np.concatenate([instance_box_volume, wall_box_volume, [fvol]], 0)
    else:
        boxes = np.concatenate([instance_box, fbox[None]], 0)
        boxes_cls = np.concatenate([instance_cls, np.full(1, ccls, instance_cls.dtype)], 0)
        boxes_volume = np.concatenate([instance_box_volume, [fvol]], 0)
    n_boxes = len(boxes)

    # ---- device: occupancy + superpoint pooling ---------------------------
    # pad every device-facing axis to buckets: compiles are per-shape and
    # expensive on the remote relay (points N, boxes B, superpoint cap)
    spp = np.asarray(spp)
    # dense-id fast path: superpoint ids from the prep pipelines are
    # already 0..K-1, so the O(N log N) unique sort is pure overhead
    # (~1.7 ms/scene on the 1-core bench host); bincount verifies density
    # in O(N) and falls back to unique otherwise
    mx = int(spp.max()) if spp.size else -1
    if spp.size and spp.min() >= 0 and mx < 2 * len(spp) and (
            np.bincount(spp.ravel(), minlength=mx + 1) > 0).all():
        n_spps = mx + 1
        spp_inverse_np = spp.astype(np.int64, copy=False)
    else:
        uniq_spp_vals, spp_inverse_np = np.unique(spp, return_inverse=True)
        n_spps = len(uniq_spp_vals)
    n_spp_cap = next_bucket(n_spps, min_size=128)
    n_cap = next_bucket(n_points, min_size=1024)
    b_cap = next_bucket(n_boxes, min_size=8)
    boxes_pad = np.full((b_cap, 6), 0.0, np.float32)
    boxes_pad[:, :3] = 1.0  # degenerate (min > max): contains nothing
    boxes_pad[:n_boxes] = boxes
    d_feat = gp_feats.shape[1]
    # standard path (gp_feats = xyz|rgb): don't re-send the xyz columns
    xyz_in_feats = d_feat >= 3 and np.array_equal(gp_feats[:, :3], coords)
    extra = gp_feats[:, 3:] if xyz_in_feats else gp_feats
    d_extra = extra.shape[1]
    rgb_packed = _try_pack_rgb(extra) if (
        xyz_in_feats and d_extra == 3
        and os.environ.get("GAPRO_PACK_RGB", "1") == "1") else None
    if rgb_packed is not None:
        # lossless uint8-grid rgb -> one f32 column (see _occupancy_and_pool)
        pbuf = np.zeros((n_cap, 5), np.float32)
        pbuf[:, 4] = -1.0  # padding rows: spp = -1 encodes invalid
        pbuf[:n_points, :3] = coords
        pbuf[:n_points, 3] = rgb_packed
        pbuf[:n_points, 4] = spp_inverse_np  # spp ids exact in f32 (< 2^24)
    else:
        pbuf = np.zeros((n_cap, 3 + d_extra + 1), np.float32)
        pbuf[:, 3 + d_extra] = -1.0  # padding rows: spp = -1 encodes invalid
        pbuf[:n_points, :3] = coords
        pbuf[:n_points, 3 : 3 + d_extra] = extra
        pbuf[:n_points, 3 + d_extra] = spp_inverse_np
    flat = np.concatenate([pbuf.ravel(), boxes_pad.ravel()])  # ONE upload
    return _PackedScene(flat, n_cap, d_extra, n_spp_cap,
                        rgb_packed is not None, b_cap, spp_inverse_np,
                        n_spps, n_boxes, n_fg, d_feat, xyz_in_feats,
                        boxes, boxes_cls, boxes_volume)


def submit_scene(coords, gp_feats, spp, instance_cls, instance_box,
                 instance_box_volume, wall_box=None, wall_box_volume=None,
                 cfg: LabelerConfig = LabelerConfig(),
                 device=None) -> "_SceneHandle":
    """Phase 1: assemble boxes on host and submit the occupancy/pooling
    device stage WITHOUT blocking — lets a sweep overlap scene i+1's device
    work with scene i's host resolution (see generate_scene_labels_stream)."""
    p = _pack_scene(coords, gp_feats, spp, instance_cls, instance_box,
                    instance_box_volume, wall_box, wall_box_volume, cfg)
    if device is None:
        flat_d = jnp.asarray(p.flat)
    else:
        flat_d = jax.device_put(p.flat, device)
    feats_dev, occ_dev = _occupancy_and_pool(
        flat_d, p.n_cap, p.d_extra, p.n_spp_cap, cfg.box_margin,
        p.rgb_packed, p.b_cap, p.xyz_in_feats, cfg.thresh_spp_occu,
    )
    return _SceneHandle(feats_dev, occ_dev, p.spp_inverse, p.n_spps,
                        p.n_boxes, p.n_fg, p.boxes, p.boxes_cls,
                        p.boxes_volume)


def submit_scenes_batched(scene_kwargs, cfg: LabelerConfig = LabelerConfig(),
                          device=None) -> list:
    """Submit a window of scenes with ONE H2D upload + ONE device program
    per same-shape group (vmapped `_occupancy_and_pool`).

    The per-scene submit path costs one tunnel transfer per scene; on the
    remote relay each transfer carries a fixed ~30 ms latency, which is
    the dominant share of the sweep's submit phase (BENCH_r03 tail:
    0.53–0.70 s/pass for 16 scenes). Bucketed shapes make same-shape
    groups the common case (all bench scenes share one bucket). Returns
    handles aligned with ``scene_kwargs``."""
    packed = [_pack_scene(cfg=cfg, **kw) for kw in scene_kwargs]
    groups: dict = {}
    for i, p in enumerate(packed):
        groups.setdefault(p.shape_key(cfg.box_margin), []).append(i)
    handles: list = [None] * len(packed)
    for key, idxs in groups.items():
        if len(idxs) == 1:
            p = packed[idxs[0]]
            flat_d = (jnp.asarray(p.flat) if device is None
                      else jax.device_put(p.flat, device))
            feats, occ = _occupancy_and_pool(
                flat_d, p.n_cap, p.d_extra, p.n_spp_cap, cfg.box_margin,
                p.rgb_packed, p.b_cap, p.xyz_in_feats, cfg.thresh_spp_occu)
            batch = None
            parts_of = lambda k, feats=feats, occ=occ: (feats, occ)
        else:
            stack = np.stack([packed[i].flat for i in idxs])
            flat_d = (jnp.asarray(stack) if device is None
                      else jax.device_put(stack, device))
            p = packed[idxs[0]]
            feats_b, batch = _occupancy_and_pool_vmapped(
                flat_d, p.n_cap, p.d_extra, p.n_spp_cap, cfg.box_margin,
                p.rgb_packed, p.b_cap, p.xyz_in_feats, cfg.thresh_spp_occu)
            # per-lane feats slices (one tiny device op each): the GP fit
            # gathers rows from them; the occupancy stays batched so the
            # stream still fetches it in ONE D2H per group
            parts_of = lambda k, fb=feats_b: (fb[k], None)
        for k, i in enumerate(idxs):
            p = packed[i]
            feats_k, occ_k = parts_of(k)
            handles[i] = _SceneHandle(
                feats_k, occ_k, p.spp_inverse, p.n_spps, p.n_boxes, p.n_fg,
                p.boxes, p.boxes_cls, p.boxes_volume, occ_batch=batch,
                lane=k)
    return handles


class _SceneResolution(NamedTuple):
    """Host state between job enumeration and GP write-back."""

    inst: np.ndarray
    det: np.ndarray
    prob: np.ndarray
    mu: np.ndarray
    var: np.ndarray
    occ_spp: np.ndarray
    n_bbs_per_spp: np.ndarray
    feats_spp: np.ndarray
    ops_list: list
    jobs: list
    handle: "_SceneHandle"


def resolve_scene(h: "_SceneHandle", cfg: LabelerConfig = LabelerConfig()):
    """Phase 2: fetch occupancy, run host ambiguity resolution + batched GP
    fits, write back labels. Returns the generate_scene_labels tuple."""
    res = enumerate_scene(h, cfg)
    gp_results = _fit_jobs_batched(res.jobs, res.feats_spp, cfg)
    return writeback_scene(res, gp_results, cfg)


def enumerate_scene(h: "_SceneHandle", cfg: LabelerConfig = LabelerConfig(),
                    occupancy_np=None) -> "_SceneResolution":
    """Fetch occupancy + enumerate the GP work exactly as the reference
    serial loop would (fits are statically determined, see module doc).
    `occupancy_np` supplies a pre-fetched host copy of the PACKED uint8
    occupancy (the windowed sweep fetches a whole window in one
    jax.device_get); the pooled feats stay on device (h.feats)."""
    n_spps = h.n_spps
    n_boxes = h.n_boxes
    boxes = h.boxes
    if occupancy_np is None:
        if h.occ_bits is not None:
            occupancy_np = np.asarray(h.occ_bits)  # one D2H fetch
        else:  # window-batched submit: fetch the shared batch, take my lane
            occupancy_np = np.asarray(h.occ_batch)[h.lane]
    occ_spp = _unpack_occ(occupancy_np, n_boxes)[:n_spps]  # [S, B] bool
    feats_spp = h.feats  # device-resident; GP fits gather rows by index
    n_bbs_per_spp = occ_spp.sum(1)

    # ---- host: serial resolution over superpoints -------------------------
    MAXDET = 1_000_000
    inst = np.full(n_spps, -100, np.int64)
    det = np.zeros(n_spps, np.int64)
    prob = np.zeros(n_spps, np.float32)
    mu = np.full(n_spps, -100.0, np.float32)
    var = np.full(n_spps, -100.0, np.float32)

    one = n_bbs_per_spp == 1
    inst[one] = np.argmax(occ_spp[one], axis=1)
    prob[one] = 1.0
    det[one] = MAXDET
    zero = n_bbs_per_spp == 0
    inst[zero] = -1
    prob[zero] = 1.0
    det[zero] = MAXDET

    iou, _ = box_giou_cross(boxes, boxes)
    np.fill_diagonal(iou, 0.0)
    visited = np.zeros(n_boxes, bool)

    # Pass 1: enumerate work exactly as the reference serial loop would.
    # ops: ("assign", spp_inds, box, set_visited_box) for in-box shortcuts,
    #      ("gp", job_index) for GP fits.
    ops_list = []
    jobs = []
    for b1 in range(n_boxes):
        overlap_inds = np.nonzero((iou[b1] > cfg.iou_overlap_min) & ~visited)[0]
        if len(overlap_inds) == 0:
            visited[b1] = True
            continue
        for b2 in overlap_inds:
            inter = np.nonzero(occ_spp[:, b1] & occ_spp[:, b2])[0]
            if len(inter) == 0:
                continue
            if is_box1_in_box2(boxes[b1], boxes[b2], offset=cfg.in_box_offset):
                ops_list.append(("assign", inter, b1))
                visited[b1] = True
                break
            if is_box1_in_box2(boxes[b2], boxes[b1], offset=cfg.in_box_offset):
                ops_list.append(("assign", inter, b2))
                visited[b2] = True
                continue
            if iou[b1, b2] >= cfg.iou_skip:
                continue
            b1_inds = np.nonzero((inst == b1) & one)[0]
            b2_inds = np.nonzero((inst == b2) & one)[0]
            if len(b1_inds) == 0 or len(b2_inds) == 0:
                continue
            jobs.append(_GPJob(b1, b2, b1_inds, b2_inds, inter))
            ops_list.append(("gp", len(jobs) - 1))
        visited[b1] = True

    return _SceneResolution(inst=inst, det=det, prob=prob, mu=mu, var=var,
                            occ_spp=occ_spp, n_bbs_per_spp=n_bbs_per_spp,
                            feats_spp=feats_spp, ops_list=ops_list, jobs=jobs,
                            handle=h)


def writeback_scene(res: "_SceneResolution", gp_results,
                    cfg: LabelerConfig = LabelerConfig()):
    """Pass 3: apply writes in the original serial order, then finalize
    labels (write-back ordering replicates the reference loop exactly)."""
    h = res.handle
    inst, det, prob, mu, var = res.inst, res.det, res.prob, res.mu, res.var
    occ_spp, n_bbs_per_spp = res.occ_spp, res.n_bbs_per_spp
    ops_list, jobs = res.ops_list, res.jobs
    n_spps, n_fg = h.n_spps, h.n_fg
    boxes_cls, boxes_volume = h.boxes_cls, h.boxes_volume
    spp_inverse_np = h.spp_inverse
    ccls = cfg.instance_classes
    MAXDET = 1_000_000

    for op in ops_list:
        if op[0] == "assign":
            _, inter, b = op
            inst[inter] = b
            det[inter] = MAXDET
            prob[inter] = 1.0
        else:
            job = jobs[op[1]]
            probs, probs_new, labels, mu_j, var_j = gp_results[op[1]]
            inter = job.intersect_inds[: len(probs)]
            ow = prob[inter] < probs_new
            sel = inter[ow]
            lab = labels[ow]
            inst[sel[lab]] = job.b2
            inst[sel[~lab]] = job.b1
            prob[sel] = probs_new[ow]
            mu[sel] = mu_j[ow]
            var[sel] = var_j[ow]
            det[sel] = len(job.intersect_inds)

    # leftover multi-box, undetermined -> smallest-volume box
    left = (n_bbs_per_spp > 1) & (det == 0)
    if left.any():
        li = np.nonzero(left)[0]
        occ_l = occ_spp[li]  # [L, B]
        vols = np.where(occ_l, boxes_volume[None, :], np.inf)
        inst[li] = np.argmin(vols, axis=1)
        prob[li] = 1.0

    # ---- labels ------------------------------------------------------------
    sem_spp = np.full(n_spps, -100, np.int32)
    inst_spp = np.full(n_spps, -100, np.int32)
    fg = inst >= 0
    sem_spp[fg] = boxes_cls[inst[fg]].astype(np.int32)
    sem_spp[inst == -1] = ccls
    inst_spp[fg] = inst[fg].astype(np.int32)
    bgbox = inst_spp >= n_fg  # wall/floor boxes are background, not instances
    inst_spp[bgbox] = -100
    sem_spp[bgbox] = ccls

    sem = sem_spp[spp_inverse_np]
    inst_pt = inst_spp[spp_inverse_np]
    prob_pt = prob[spp_inverse_np]
    return sem, inst_pt, prob_pt, mu, var, spp_inverse_np


def generate_scene_labels_stream(scene_iter, cfg: LabelerConfig = LabelerConfig(),
                                 window: int = 4, devices=None):
    """Windowed pipelined sweep (the SURVEY §2.5 scale showcase):

      * scenes are processed in windows of ``window``; all occupancy/pooling
        stages of window w+1 are submitted (round-robin over ``devices``)
        BEFORE window w resolves on the host, hiding the relay latency;
      * within a window, ALL scenes' GP fits go into ONE cross-scene
        bucketed `_fit_jobs_batched` call — the per-scene device-dispatch
        cost (2 relay round trips each ~30 ms) amortizes over the window;
      * ``devices`` (default: all of jax.devices()) spreads both occupancy
        and GP-fit groups across the mesh — scenes are embarrassingly
        parallel (the reference leaves this on the table, its loop is
        serial per scene, gapro/gen_ps.py:36).

    scene_iter yields dicts with the submit_scene kwargs (coords, gp_feats,
    spp, instance_cls, instance_box, instance_box_volume [, wall_box,
    wall_box_volume]); yields (scene_dict, labels_tuple) pairs in order.
    """
    if devices is None:
        devices = jax.devices()
    it = iter(scene_iter)
    window = max(window, 1)

    import time as _time

    # per-phase wall-clock accumulators (read by bench.py / gen_ps.py for
    # the sweep summary; reset per sweep by the caller)
    phase = PHASE_STATS

    def take(n):
        out = []
        for _ in range(n):
            s = next(it, None)
            if s is None:
                break
            out.append(s)
        return out

    # OFF by default: a same-relay-window A/B (12 alternating passes,
    # round 4) measured the batched path SLOWER — submit med 0.43 vs
    # 0.34 s/pass, overall 10.4 vs 10.9 scenes/s — because one big
    # [K, L] put serializes all K scenes' numpy packing before any bytes
    # move, while per-scene threads stream scene 0 during scene 1's
    # packing. Kept as an option for true multi-device meshes where the
    # per-device put count, not pipelining, binds.
    batch_submit = os.environ.get("GAPRO_SUBMIT_BATCH", "0") == "1"

    def submit_window(scenes, base):
        t0 = _time.perf_counter()
        if batch_submit:
            # ONE upload + ONE program per (device, same-shape group):
            # tunnel transfers carry a fixed ~30 ms latency each; device
            # groups still overlap via the thread pool
            per_dev: dict = {}
            for i, s in enumerate(scenes):
                per_dev.setdefault((base + i) % len(devices), []).append(i)
            out = [None] * len(scenes)
            def run(dev_idxs):
                dev, idxs = dev_idxs
                hs = submit_scenes_batched([scenes[i] for i in idxs], cfg,
                                           device=devices[dev])
                for i, h in zip(idxs, hs):
                    out[i] = h
            list(submit_pool.map(run, per_dev.items()))
        else:
            # per-scene submits run concurrently: device_put blocks on the
            # relay transfer (measured, docs/PERF.md), so K threads overlap
            # K transfer latencies (numpy packing serializes on the GIL)
            out = list(submit_pool.map(
                lambda iscene: submit_scene(
                    cfg=cfg, device=devices[(base + iscene[0]) % len(devices)],
                    **iscene[1]),
                enumerate(scenes)))
        phase["submit"] += _time.perf_counter() - t0
        return out

    # window w+1's H2D submit runs on a background thread: the main
    # thread's D2H waits (occ_fetch + gp_fetch, ~40% of a steady pass)
    # block on tunnel I/O with the GIL released, so the submit thread's
    # numpy packing + device_put overlap them instead of serializing
    # after the writeback (single-core host: this hides transport, it
    # does not add CPU parallelism). JAX dispatch is thread-safe; the
    # scene iterator stays on the main thread (take() above).
    from concurrent.futures import ThreadPoolExecutor

    executor = ThreadPoolExecutor(max_workers=1)
    # 4 concurrent per-scene uploads by default: device_put blocks on the
    # relay transfer, so threads overlap transfer latencies. A/B in the
    # same relay window: threads=4 best pass 11.0 vs threads=1 8.0 vs
    # pre-change baseline 7.5 scenes/s (docs/PERF.md).
    n_sub = int(os.environ.get("GAPRO_SUBMIT_THREADS", "4"))
    submit_pool = ThreadPoolExecutor(max_workers=max(1, min(window, n_sub)))

    # merged gp+occ fetch (one device_get per iteration) saves a ~30 ms
    # relay round trip per window, at the cost of the window-w enumeration
    # no longer overlapping the tail of window w-1's GP fits; A/B'able via
    # GAPRO_MERGE_GP_FETCH (see docs/PERF.md round-5 fetch notes)
    merge_gp_fetch = os.environ.get("GAPRO_MERGE_GP_FETCH", "1") == "1"

    def enumerate_and_submit(scenes, handles, prev_pending):
        # host: batched occupancy fetch, enumerate all, dispatch one
        # cross-scene bucketed GP fit — WITHOUT blocking on the fit
        # (unpacked one loop iteration later, so window w's GP compute
        # runs on device while window w+1 is enumerated on the host: the
        # device never idles between windows)
        t0 = _time.perf_counter()
        # ONE device_get per iteration: each shared occupancy window batch
        # ONCE (bit-packed uint8; the pooled feats never leave the device)
        # + any per-scene occupancies + the PREVIOUS window's in-flight GP
        # results — merging the gp fetch into this call saves a ~30 ms
        # relay round trip per window (the occupancy is queued behind the
        # GP fits on the device anyway, so no extra wait is introduced)
        uniq_batches: dict = {}
        for h in handles:
            if h.occ_bits is None:
                uniq_batches.setdefault(id(h.occ_batch), h.occ_batch)
        singles = [h.occ_bits for h in handles if h.occ_bits is not None]
        gp_dev = (_fit_jobs_device_results(prev_pending)
                  if merge_gp_fetch and prev_pending is not None else [])
        fetched = jax.device_get(
            list(uniq_batches.values()) + singles + gp_dev)
        n_occ = len(uniq_batches) + len(singles)
        gp_fetched = fetched[n_occ:] if gp_dev else None
        batch_np = dict(zip(uniq_batches.keys(),
                            fetched[: len(uniq_batches)]))
        single_it = iter(fetched[len(uniq_batches):n_occ])
        occs = [next(single_it) if h.occ_bits is not None
                else batch_np[id(h.occ_batch)][h.lane] for h in handles]
        t1 = _time.perf_counter()
        phase["occ_fetch"] += t1 - t0
        resolutions = [enumerate_scene(h, cfg, occupancy_np=o)
                       for h, o in zip(handles, occs)]
        all_jobs = []
        feats_list = []
        for si, res in enumerate(resolutions):
            feats_list.append(res.feats_spp)
            all_jobs.extend(j._replace(scene=si) for j in res.jobs)
        phase["enumerate"] += _time.perf_counter() - t1
        pending = _fit_jobs_submit(all_jobs, feats_list, cfg, device=devices)
        return (scenes, resolutions, pending), gp_fetched

    base = 0
    cur_scenes = take(window)
    cur_handles = submit_window(cur_scenes, base)
    prev = None  # previous window: (scenes, resolutions, in-flight fits)
    while cur_scenes or prev is not None:
        prev_pending0 = prev[2] if prev is not None else None
        if cur_scenes:
            nxt_scenes = take(window)
            nxt_future = executor.submit(submit_window, nxt_scenes,
                                         base + len(cur_scenes))
            base += len(cur_scenes)
            cur_state, gp_fetched = enumerate_and_submit(
                cur_scenes, cur_handles, prev_pending0)
        else:
            nxt_scenes, nxt_future, cur_state, gp_fetched = [], None, None, None

        if prev is not None:
            prev_scenes, prev_res, prev_pending = prev
            all_results = _fit_jobs_fetch(prev_pending, fetched=gp_fetched)
            t2 = _time.perf_counter()
            off = 0
            for scene, res in zip(prev_scenes, prev_res):
                k = len(res.jobs)
                yield scene, writeback_scene(res, all_results[off:off + k],
                                             cfg)
                off += k
            phase["writeback"] += _time.perf_counter() - t2

        prev = cur_state
        if nxt_future is not None:
            cur_scenes, cur_handles = nxt_scenes, nxt_future.result()
    executor.shutdown(wait=False)
    submit_pool.shutdown(wait=False)
