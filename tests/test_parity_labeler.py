"""Cross-implementation parity for the GP pseudo-labeler pipeline.

The GP fit itself needs gpytorch (absent here), so BOTH sides get the same
deterministic index-based fake posterior injected; what's compared is
everything else the labeler does — occupancy, superpoint pooling, the serial
ambiguity-resolution loop (in-box shortcuts, IoU skip, write-back ordering,
overwrite-by-confidence), leftover min-volume assignment, wall/floor box
handling, and final label mapping — against the runnable reference
(gapro/gen_ps_utils.py:293-482).  Also: box utils, wall-box extraction, and
the mIoU referee.
"""

import json
import os
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
import ref_shim  # noqa: E402

from gapro_tpu.labeler import pipeline as pl  # noqa: E402
from gapro_tpu.labeler.boxes import (  # noqa: E402
    box_giou_cross,
    is_box1_in_box2,
    wall_boxes_from_planes,
)
from gapro_tpu.eval.pseudo import pseudo_label_miou_scene  # noqa: E402


# --------------------------------------------------------------------------- #
# shared deterministic fake GP posterior
# --------------------------------------------------------------------------- #


def _fake_posterior(b1_inds, b2_inds, intersect_inds):
    """Pure-index fake: probs/mu/var depend only on the job's index sets, so
    both pipelines see identical 'GP outputs' regardless of float pooling."""
    ii = np.asarray(intersect_inds, np.int64)
    salt = len(b1_inds) * 13 + len(b2_inds) * 29
    probs = ((ii * 7 + salt) % 101).astype(np.float64) / 101.0
    labels = probs >= 0.5
    probs_new = np.where(labels, probs, 1.0 - probs)
    mu = probs * 4.0 - 2.0
    var = 0.05 + (ii % 7).astype(np.float64) * 0.05
    return (probs.astype(np.float32), probs_new.astype(np.float32),
            labels, mu.astype(np.float32), var.astype(np.float32))


def _fake_fit_gp_spp(coords_spp, feats_spp, b1_inds, b2_inds, intersect_inds,
                     training_iter=50):
    import torch

    probs, probs_new, labels, mu, var = _fake_posterior(
        b1_inds.cpu().numpy(), b2_inds.cpu().numpy(), intersect_inds.cpu().numpy())
    t = lambda x: torch.from_numpy(np.asarray(x))
    return t(probs), t(probs_new), t(labels), t(mu), t(var)


def _fake_fit_jobs_batched(jobs, feats_spp, cfg):
    return [_fake_posterior(j.b1_inds, j.b2_inds, j.intersect_inds) for j in jobs]


# --------------------------------------------------------------------------- #
# scene generation
# --------------------------------------------------------------------------- #


def _random_scene(rng, n_points=4000, n_inst=10):
    coords = (rng.random((n_points, 3)) * 4.0).astype(np.float32)
    feats = rng.random((n_points, 3)).astype(np.float32)
    # superpoints = spatial grid cells -> compact ids
    cell = np.floor(coords / 0.3).astype(np.int64)
    key = cell[:, 0] * 10000 + cell[:, 1] * 100 + cell[:, 2]
    _, spp = np.unique(key, return_inverse=True)

    centers = rng.random((n_inst, 3)).astype(np.float32) * 3.5 + 0.25
    # mixed sizes so some boxes nest inside others (in-box shortcut paths)
    half = (rng.random((n_inst, 3)).astype(np.float32) * 0.8 + 0.15)
    boxes = np.concatenate([centers - half, centers + half], 1)
    boxes = np.clip(boxes, 0.0, 4.0)
    cls = rng.integers(0, 18, size=n_inst).astype(np.int64)
    vols = np.prod(np.clip(boxes[:, 3:] - boxes[:, :3], 1e-3, None), axis=1)
    return coords, feats, spp, cls, boxes, vols.astype(np.float32)


def _wall_boxes(rng, n=3):
    boxes = []
    for _ in range(n):
        x = rng.random() * 4
        boxes.append([x, 0.0, 0.0, x + 0.1, 4.0, 3.0])
    boxes = np.asarray(boxes, np.float32)
    vols = np.prod(boxes[:, 3:] - boxes[:, :3], axis=1)
    return boxes, vols.astype(np.float32)


# --------------------------------------------------------------------------- #
# the main pipeline parity test
# --------------------------------------------------------------------------- #


@pytest.mark.parametrize("seed,with_walls", [(0, False), (1, True), (2, True)])
def test_labeler_pipeline_parity(seed, with_walls, monkeypatch):
    import torch

    rng = np.random.default_rng(seed)
    coords, feats, spp, cls, boxes, vols = _random_scene(rng)
    if with_walls:
        wb, wv = _wall_boxes(rng)
    else:
        wb, wv = np.zeros((0, 6), np.float32), np.zeros(0, np.float32)

    # ---- reference with fake GP ----
    g = ref_shim.load_gapro("gen_ps_utils", fake_fit_gp_spp=_fake_fit_gp_spp)
    t = lambda x: torch.from_numpy(np.asarray(x))
    ref_sem, ref_inst, ref_prob, ref_mu, ref_var = g.gen_pseudo_label_gaussian_process(
        t(coords), t(feats), t(spp), t(cls), t(boxes), t(vols), t(wb), t(wv),
        instance_classes=18, thresh_spp_occu=0.999,
    )
    ref_sem, ref_inst = ref_sem.numpy(), ref_inst.numpy()
    ref_prob = ref_prob.numpy()
    ref_mu, ref_var = ref_mu.numpy(), ref_var.numpy()

    # ---- ours with the same fake GP ----
    monkeypatch.setattr(pl, "_fit_jobs_batched", _fake_fit_jobs_batched)
    sem, inst, prob, mu, var, spp_inv = pl.generate_scene_labels(
        coords, feats, spp, cls, boxes, vols,
        wall_box=wb if with_walls else None,
        wall_box_volume=wv if with_walls else None,
    )

    np.testing.assert_array_equal(sem, ref_sem)
    np.testing.assert_array_equal(inst, ref_inst)
    np.testing.assert_allclose(prob, ref_prob, atol=1e-6)
    np.testing.assert_allclose(mu, ref_mu, atol=1e-6)
    np.testing.assert_allclose(var, ref_var, atol=1e-6)


# --------------------------------------------------------------------------- #
# box utilities
# --------------------------------------------------------------------------- #


def test_box_utils_parity():
    import torch

    g = ref_shim.load_gapro("gen_ps_utils")
    rng = np.random.default_rng(3)
    c = rng.random((20, 3)).astype(np.float32) * 3
    h = rng.random((20, 3)).astype(np.float32) + 0.05
    b1 = np.concatenate([c - h, c + h], 1)
    c2 = rng.random((15, 3)).astype(np.float32) * 3
    h2 = rng.random((15, 3)).astype(np.float32) + 0.05
    b2 = np.concatenate([c2 - h2, c2 + h2], 1)

    t = torch.from_numpy
    iou_ref, giou_ref = g.batch_giou_cross(t(b1), t(b2))
    iou_my, giou_my = box_giou_cross(b1, b2)
    np.testing.assert_allclose(iou_my, iou_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(giou_my, giou_ref.numpy(), atol=1e-5)

    for i in range(10):
        for j in range(10):
            a = bool(g.is_box1_in_box2(t(b1[i]), t(b1[j]), offset=0.1))
            b = bool(is_box1_in_box2(b1[i], b1[j], offset=0.1))
            assert a == b, (i, j)


# --------------------------------------------------------------------------- #
# wall-box extraction (scannet_planes)
# --------------------------------------------------------------------------- #


def test_wall_boxes_parity(tmp_path, monkeypatch):
    sp_ref = ref_shim.load_gapro("scannet_planes")
    rng = np.random.default_rng(4)

    # synthetic room: 4 vertical wall quads + 1 horizontal (filtered) +
    # 1 non-planar (filtered), in the reference's pre-swizzle coordinate
    # convention (y_file = -z_world, z_file = y_world  per scannet_planes
    # get_wall_boxes vert swizzle)
    def quad_wall(x0, y0, x1, y1, h):
        return [[x0, y0, 0.0], [x0, y0, h], [x1, y1, h], [x1, y1, 0.0]]

    verts_world = (quad_wall(0, 0, 4, 0, 3) + quad_wall(4, 0, 4, 4, 3)
                   + quad_wall(4, 4, 0, 4, 3) + quad_wall(0, 4, 0, 0, 3))
    # horizontal quad (ceiling): normal ~ +z -> filtered by |n_z| < 0.2
    verts_world += [[0, 0, 3], [4, 0, 3], [4, 4, 3], [0, 4, 3]]
    # non-planar quad
    verts_world += [[0, 0, 0], [1, 0, 1], [0, 1, 0], [1, 1, 5]]
    verts_world = np.asarray(verts_world, float)
    quads = [[i * 4, i * 4 + 1, i * 4 + 2, i * 4 + 3] for i in range(6)]

    # file stores pre-swizzle coords: the loader does (y, z) <- (-z, y)
    verts_file = verts_world.copy()
    verts_file[:, 1] = verts_world[:, 2]
    verts_file[:, 2] = -verts_world[:, 1]

    scan = "scene_test"
    plane_dict = {"verts": verts_file.tolist(), "quads": quads}
    d = tmp_path / "dataset" / "scannetv2" / "scannet_planes"
    d.mkdir(parents=True)
    (d / f"{scan}.json").write_text(json.dumps(plane_dict))
    td = tmp_path / "dataset" / "scannetv2" / "scans_transform" / scan
    td.mkdir(parents=True)
    mat = np.eye(4)
    mat[:3, 3] = [0.5, -0.25, 0.0]
    (td / f"{scan}.txt").write_text(
        "axisAlignment = " + " ".join(str(v) for v in mat.reshape(-1)))

    monkeypatch.chdir(tmp_path)
    ref_cls, ref_boxes, ref_vols = sp_ref.get_wall_boxes(scan)

    my_cls, my_boxes, my_vols = wall_boxes_from_planes(plane_dict, mat)

    assert len(ref_boxes) == len(my_boxes) == 4
    np.testing.assert_allclose(np.sort(my_boxes, 0), np.sort(np.asarray(ref_boxes), 0),
                               atol=1e-5)
    np.testing.assert_allclose(np.sort(my_vols), np.sort(np.asarray(ref_vols)), atol=1e-5)
    assert all(c == 18 for c in my_cls) and all(c == 18 for c in ref_cls)


# --------------------------------------------------------------------------- #
# mIoU referee
# --------------------------------------------------------------------------- #


def test_miou_parity(monkeypatch):
    import torch

    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    el = ref_shim.load_gapro("eval_ps_labels")
    rng = np.random.default_rng(5)
    n = 3000
    sem = rng.integers(0, 19, size=n).astype(np.int64)
    inst = rng.integers(-1, 8, size=n).astype(np.int64)
    # keep sem consistent within a GT instance (the referee takes sem of the
    # first member point)
    for i in range(8):
        m = inst == i
        if m.any():
            sem[m] = sem[np.nonzero(m)[0][0]]
    ps_sem = rng.integers(0, 19, size=n).astype(np.int64)
    ps_inst = rng.integers(-1, 10, size=n).astype(np.int64)
    for i in range(10):
        m = ps_inst == i
        if m.any():
            ps_sem[m] = ps_sem[np.nonzero(m)[0][0]]

    t = torch.from_numpy
    ref = el.get_miou_scene(t(sem), t(inst), t(ps_sem), t(ps_inst)).numpy()
    mine = pseudo_label_miou_scene(sem, inst, ps_sem, ps_inst)
    np.testing.assert_allclose(mine, ref, atol=1e-4)
