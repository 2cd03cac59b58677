"""Self-training round trip (SURVEY §3.5) on the real-format fixture scene:

  train ckpt -> tools/export_features.py (mask-tower feats per point)
  -> tools/gen_ps.py --use_deepfeat (deep feats replace xyz+rgb as GP input,
     reference gapro/gen_ps.py:48-55)
  -> tools/train.py with label_type = the produced pseudo-label dir
     (pseudo labels replace GT, reference isbnet/data/scannetv2.py:33-53)

Each stage runs the actual CLI in a subprocess against a symlinked copy of
tests/fixtures/scannetv2, so formats on disk are the reference's.
"""

import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
FIX = osp.join(REPO, "tests", "fixtures", "scannetv2")


def _run(cmd, timeout=900):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    r = subprocess.run([sys.executable] + cmd, cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=timeout)
    assert r.returncode == 0, f"{cmd[0]} failed:\n{r.stdout[-1500:]}\n{r.stderr[-3000:]}"
    return r


@pytest.mark.slow
def test_selftrain_roundtrip(tmp_path):
    # writable dataset root: symlink the fixture subdirs, pseudo labels
    # will be written alongside (the dataset loads them from
    # data_root/<label_type>/<scan>.pth)
    droot = tmp_path / "scannetv2"
    droot.mkdir()
    for sub in ("train", "val", "superpoints", "scans_transform",
                "scannet_planes"):
        os.symlink(osp.join(FIX, sub), droot / sub)

    cfg_text = open(osp.join(REPO, "configs", "tiny_synthetic.yaml")).read()
    cfg_text = cfg_text.replace("data_root: dataset/scannetv2",
                                f"data_root: {droot}")
    cfg_text = cfg_text.replace("prefix_val: val", "prefix_val: train")
    cfg_text = cfg_text.replace("label_type: null",
                                "label_type: gp_deepfeat_ps")
    # the miniature fixture scene is smaller than the tiny config's
    # training floor
    cfg_text = cfg_text.replace("min_npoint: 500", "min_npoint: 10")
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(cfg_text)

    # 1. export mask-tower features (fresh init — no trained ckpt on this
    # machine; the path under test is the export plumbing, not the weights)
    feats_dir = tmp_path / "maskfeats"
    _run(["tools/export_features.py", str(cfg), "--save_dir", str(feats_dir)])
    import torch

    feats = np.asarray(torch.load(feats_dir / "scene0000_00.pth",
                                  map_location="cpu", weights_only=False))
    from gapro_tpu.data.scannet_io import load_scene

    xyz, _, sem_gt, inst_gt = load_scene(
        osp.join(FIX, "train", "scene0000_00_inst_nostuff.pth"))
    assert feats.shape == (len(xyz), 8)  # tiny-config mask_dim_out
    assert np.isfinite(feats).all()

    # 2. GP pseudo labels from the deep features
    ps_dir = droot / "gp_deepfeat_ps"
    _run(["tools/gen_ps.py", "--data_root", str(droot), "--split", "train",
          "--save_folder", str(ps_dir), "--use_deepfeat",
          "--deepfeat_folder", str(feats_dir), "--training_iter", "5",
          "--eval_pslabel"])
    from gapro_tpu.data.scannet_io import load_pseudo_labels

    sem, inst, prob, mu, var = load_pseudo_labels(
        str(ps_dir / "scene0000_00.pth"))
    assert len(sem) == len(inst) == len(xyz)
    assert np.isfinite(mu).all() and np.isfinite(var).all()
    # -100 is the reference's "no GP fit for this superpoint" sentinel
    # (the KL loss masks on it); real variances must be non-negative
    assert ((var >= 0) | (var == -100)).all()
    assert (inst >= 0).any()  # some foreground instances were labeled

    # the dataset actually substitutes the pseudo labels for GT
    from gapro_tpu.data.dataset import ScanNetDataset, VoxelCfg

    ds = ScanNetDataset(str(droot), prefix="train", training=True,
                        label_type="gp_deepfeat_ps",
                        voxel_cfg=VoxelCfg(scale=20, max_npoint=50000,
                                           min_npoint=10))
    item = ds.load(0)
    assert "mu" in item and "var" in item  # KL-loss inputs present

    # 3. one training epoch consuming the pseudo labels end to end
    work = tmp_path / "run"
    _run(["tools/train.py", str(cfg), "--work_dir", str(work),
          "--epochs", "1", "--batch_size", "1", "--skip_validate"])
    metrics = work / "metrics.jsonl"
    assert metrics.exists() and metrics.read_text().strip()
