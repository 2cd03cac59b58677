"""Real-format robustness (VERDICT round-1 weak #8): miniature checked-in
fixtures in the reference's exact on-disk formats exercise scannet_io, the
ScanNetDataset, tools/prepare_scannet.py's raw-scan path, the wall-box
loader, and the gen_ps pseudo-label save/load round trip."""

import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

FIX = osp.join(osp.dirname(osp.abspath(__file__)), "fixtures")
ROOT = osp.join(FIX, "scannetv2")


def test_load_scene_real_format():
    from gapro_tpu.data.scannet_io import load_scene, load_superpoints

    xyz, rgb, sem, inst = load_scene(
        osp.join(ROOT, "train", "scene0000_00_inst_nostuff.pth"))
    n = len(xyz)
    assert xyz.dtype == np.float32 and rgb.dtype == np.float32
    assert sem.dtype == np.int64 and inst.dtype == np.int64
    assert rgb.min() >= -1.0 and rgb.max() <= 1.0
    assert np.abs(xyz.mean(0)).max() < 1e-3  # mean-centered by the writer
    assert set(np.unique(sem)) <= set(range(20)) | {-100}
    spp = load_superpoints(osp.join(ROOT, "superpoints", "scene0000_00.pth"))
    assert len(spp) == n


def test_axis_align_matrix():
    from gapro_tpu.data.scannet_io import apply_axis_align, load_axis_align_matrix

    m = load_axis_align_matrix(
        osp.join(ROOT, "scans_transform", "scene0000_00", "scene0000_00.txt"))
    assert m.shape == (4, 4)
    np.testing.assert_allclose(m[:3, 3], [0.25, -0.5, 0.0])
    pts = np.zeros((2, 3), np.float32)
    out = apply_axis_align(pts, m)
    np.testing.assert_allclose(out[0], [0.25, -0.5, 0.0], atol=1e-6)


def test_wall_boxes_from_fixture_planes():
    import json

    from gapro_tpu.data.scannet_io import load_axis_align_matrix
    from gapro_tpu.labeler.boxes import wall_boxes_from_planes

    planes = json.load(open(osp.join(ROOT, "scannet_planes", "scene0000_00.json")))
    mat = load_axis_align_matrix(
        osp.join(ROOT, "scans_transform", "scene0000_00", "scene0000_00.txt"))
    cls, boxes, vols = wall_boxes_from_planes(planes, mat)
    assert len(boxes) == 2  # both fixture quads are vertical walls
    assert all(c == 18 for c in cls)
    # axis-aligned wall quads are zero-thickness planes -> volume 0 (the
    # reference produces the same; volumes only break ties in the labeler)
    assert (np.asarray(vols) >= 0).all()
    np.testing.assert_allclose(boxes[0], [0.25, -0.5, 0.0, 3.25, -0.5, 2.5],
                               atol=1e-5)


def test_scannet_dataset_end_to_end():
    from gapro_tpu.data.dataset import ScanNetDataset, VoxelCfg, build_dataloader

    ds = ScanNetDataset(ROOT, prefix="train", training=True,
                        voxel_cfg=VoxelCfg(scale=20, max_npoint=50000,
                                           min_npoint=10))
    assert len(ds) == 1
    lb = next(iter(build_dataloader(ds, batch_size=1, training=True)))
    assert lb.points.coords.shape[1] == 4
    assert lb.scan_ids == ["scene0000_00"]


def test_prepare_scannet_cli(tmp_path):
    """Raw ply/json -> _inst_nostuff.pth via the CLI; output must match the
    checked-in reference-format fixture semantically."""
    repo = osp.dirname(osp.dirname(osp.abspath(__file__)))
    out = str(tmp_path / "out")
    r = subprocess.run(
        [sys.executable, osp.join(repo, "tools", "prepare_scannet.py"),
         "--scans_dir", osp.join(FIX, "raw_scans"), "--out", out,
         "--split", "train",
         "--labels_tsv", osp.join(FIX, "raw_scans", "scannetv2-labels.combined.tsv")],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]

    from gapro_tpu.data.scannet_io import load_scene

    got = load_scene(osp.join(out, "train", "scene0000_00_inst_nostuff.pth"))
    want = load_scene(osp.join(ROOT, "train", "scene0000_00_inst_nostuff.pth"))
    np.testing.assert_allclose(got[0], want[0], atol=1e-5)  # xyz
    np.testing.assert_allclose(got[1], want[1], atol=1e-5)  # rgb
    np.testing.assert_array_equal(got[2], want[2])  # semantic remap
    # instance ids may be permuted between writers; compare partitions
    gi, wi = got[3], want[3]
    assert set(np.unique(gi >= 0)) == set(np.unique(wi >= 0))
    np.testing.assert_array_equal(gi >= 0, wi >= 0)
    for k in np.unique(wi[wi >= 0]):
        members = np.unique(gi[wi == k])
        assert len(members) == 1 and members[0] >= 0


def test_pseudo_label_roundtrip(tmp_path):
    """gen_ps 5-tuple (point sem/inst/prob + SPP-level mu/var) save/load,
    then ScanNetDataset consumes it via label_type (scannetv2.py:33-53)."""
    from gapro_tpu.data.dataset import ScanNetDataset, VoxelCfg
    from gapro_tpu.data.scannet_io import (load_pseudo_labels, load_scene,
                                           load_superpoints, save_pseudo_labels)

    xyz, _, _, _ = load_scene(osp.join(ROOT, "train", "scene0000_00_inst_nostuff.pth"))
    spp = load_superpoints(osp.join(ROOT, "superpoints", "scene0000_00.pth"))
    n = len(xyz)
    n_spp = int(spp.max()) + 1
    rng = np.random.default_rng(0)
    sem = rng.integers(-100, 19, size=n).astype(np.int32)
    inst = rng.integers(-100, 4, size=n).astype(np.int32)
    prob = rng.random(n).astype(np.float32)
    mu = rng.standard_normal(n_spp).astype(np.float32)  # SPP-level!
    var = rng.random(n_spp).astype(np.float32)

    lbl_dir = tmp_path / "gp_labels"
    save_pseudo_labels(str(lbl_dir / "scene0000_00.pth"), sem, inst, prob, mu, var)
    got = load_pseudo_labels(str(lbl_dir / "scene0000_00.pth"))
    np.testing.assert_array_equal(got[0], sem)
    np.testing.assert_allclose(got[3], mu)
    assert len(got[3]) == n_spp  # stays spp-level on disk (gen_ps.py:132)

    # dataset expands spp-level mu/var to points
    import shutil

    droot = tmp_path / "dataset"
    shutil.copytree(ROOT, droot)
    shutil.copytree(lbl_dir, droot / "gp_labels")
    ds = ScanNetDataset(str(droot), prefix="train", training=True,
                        label_type="gp_labels",
                        voxel_cfg=VoxelCfg(scale=20, max_npoint=50000,
                                           min_npoint=10))
    scene = ds.load(0)
    assert len(scene["mu"]) == n
    spp_compact = np.unique(spp, return_inverse=True)[1]
    np.testing.assert_allclose(scene["mu"], mu[spp_compact])
    np.testing.assert_allclose(scene["var"], var[spp_compact])
