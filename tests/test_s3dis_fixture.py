"""Real-format S3DIS fixture (VERDICT r2 #8): miniature Stanford-layout room
(tests/fixtures/s3dis_raw/Area_5/office_1/Annotations/*.txt) through
tools/prepare_s3dis.py -> pth round trip -> S3DISDataset -> x4_split
inference with sem2ins ceiling/floor instances."""

import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

FIX = osp.join(osp.dirname(osp.abspath(__file__)), "fixtures")
REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


@pytest.fixture(scope="module")
def prepared_root(tmp_path_factory):
    out = tmp_path_factory.mktemp("s3dis")
    r = subprocess.run(
        [sys.executable, osp.join(REPO, "tools", "prepare_s3dis.py"),
         "--data_dir", osp.join(FIX, "s3dis_raw"), "--out", str(out),
         "--areas", "5"],
        capture_output=True, text=True,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin",
             "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu",
             "HOME": "/root"},
    )
    assert r.returncode == 0, r.stderr
    return out


def test_prepare_round_trip(prepared_root):
    import torch

    pth = prepared_root / "preprocess" / "Area_5_office_1_inst_nostuff.pth"
    assert pth.exists()
    xyz, rgb, sem, inst = torch.load(str(pth), weights_only=False)
    n = len(xyz)
    assert n == 1250  # 300+300+200+150+150+150 fixture points
    assert rgb.min() >= -1.0 and rgb.max() <= 1.0
    # annotation classes: ceiling 0, floor 1, wall 2, chair 7, table 8
    assert set(np.unique(sem)) == {0, 1, 2, 7, 8}
    assert inst.max() == 5  # six objects
    spp = torch.load(
        str(prepared_root / "superpoints" / "Area_5_office_1.pth"),
        weights_only=False)
    assert len(spp) == n and spp.max() >= 0


def test_s3dis_dataset_load(prepared_root):
    from gapro_tpu.data.dataset import S3DISDataset, VoxelCfg

    # reference prefix semantics: filename prefix inside preprocess/
    ds = S3DISDataset(str(prepared_root), prefix="Area_5", training=False,
                      voxel_cfg=VoxelCfg(scale=20, max_npoint=20000,
                                         min_npoint=100))
    assert len(ds) == 1
    scene = ds.load(0)
    # S3DIS semantics are NOT ScanNet-remapped: ceiling=0/floor=1 survive
    assert set(np.unique(scene["semantic"])) == {0, 1, 2, 7, 8}
    assert scene["scan_id"] == "Area_5_office_1"

    # train mode: 25% subsample (reference s3dis.py:51-60)
    ds_tr = S3DISDataset(str(prepared_root), prefix="Area_5", training=True,
                         voxel_cfg=VoxelCfg(scale=20, max_npoint=20000,
                                            min_npoint=100))
    sub = ds_tr.load(0)
    assert 0.15 < len(sub["xyz"]) / len(scene["xyz"]) < 0.35


def test_x4_split_sem2ins_end_to_end(prepared_root):
    """Full S3DIS test-time path on the fixture room: 4-piece interleaved
    split -> merged inference -> get_instances with sem2ins ceiling/floor."""
    import jax

    from gapro_tpu.data.dataset import S3DISDataset, VoxelCfg
    from gapro_tpu.models import ISBNet, TestConfig, get_instances
    from gapro_tpu.models.prepare import points_to_batch_np, prepare_voxel_batch, upload_point_batch
    from gapro_tpu.utils.rle import rle_decode

    from tests.test_isbnet_forward import _tiny_cfg

    ds = S3DISDataset(str(prepared_root), prefix="Area_5", training=False,
                      voxel_cfg=VoxelCfg(scale=20, max_npoint=20000,
                                         min_npoint=100))
    scene = ds.load(0)
    n_points = len(scene["xyz"])
    pieces = ds.split_pieces(scene)
    perm = np.concatenate([p["piece_indices"] for p in pieces])
    pbh = points_to_batch_np(pieces, voxel_scale=20)
    pb = upload_point_batch(pbh)
    prepared = prepare_voxel_batch(pb, pbh.coords.shape[0], 4, 3, 512, 0.75)

    cfg = _tiny_cfg().__class__(**{**_tiny_cfg().__dict__,
                                   "filter_bg_thresh": 0.0,
                                   "instance_classes": 13,
                                   "semantic_classes": 13})
    model = ISBNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), prepared.batch, False)
    out = model.apply(
        variables, prepared.batch,
        method=lambda m, b: m.forward_inference(b, (8, 4), x4_split=True))

    tc = TestConfig(topk=8, topk_insts=16, npoint_thresh=10, score_thresh=0.0,
                    instance_classes=13, label_offset=3,
                    sem2ins_classes=(0, 1))
    spp_cat = np.concatenate([p["spp"] for p in pieces])
    insts = get_instances(
        "Area_5_office_1", out, prepared.batch, spp_cat,
        np.asarray(prepared.point2voxel), n_points, tc)
    # ceiling/floor semantic instances always present, conf 1.0, label 1/2
    assert insts[0]["label_id"] == 1 and insts[0]["conf"] == 1.0
    assert insts[1]["label_id"] == 2 and insts[1]["conf"] == 1.0
    # masks cover the piece-concatenated scene; unscramble restores order
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    m0 = rle_decode(insts[0]["pred_mask"])[inv]
    assert len(m0) == n_points
