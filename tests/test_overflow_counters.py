"""Overflow counters ("no silent caps", VERDICT round-1 weak #4): every
static capacity that can drop data must surface a counter when exceeded —
U-Net level capacity, fg-voxel cap, spp cap, GT-instance cap, GP train cap.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gapro_tpu.labeler import pipeline as pl
from gapro_tpu.labeler.pipeline import LabelerConfig
from gapro_tpu.losses.criterion import CriterionConfig
from gapro_tpu.models import ISBNet, ISBNetConfig
from gapro_tpu.ops.voxelize import voxelize
from gapro_tpu.train.step import make_train_step

from tests.test_isbnet_forward import _make_prepared, _tiny_cfg
import pytest


def test_voxelize_overflow_counter():
    coords = jnp.asarray(
        [[0, z, y, x] for z in range(4) for y in range(4) for x in range(4)],
        jnp.int32)
    maps_ok = voxelize(coords, (4, 4, 4), 64)
    assert int(maps_ok.overflow) == 0
    maps_drop = voxelize(coords, (4, 4, 4), 40)
    assert int(maps_drop.overflow) == 24
    assert int(maps_drop.num_voxels) == 40


def test_model_overflow_counters_zero_when_capacious():
    cfg = ISBNetConfig(**{**_tiny_cfg().__dict__, "filter_bg_thresh": 0.0})
    prepared = _make_prepared()
    model = ISBNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), prepared.batch, False)
    out = model.apply(variables, prepared.batch, False)
    assert int(out["ovf_spp_slots"]) == 0
    assert int(out["ovf_plan_voxels"]) == 0


def test_model_overflow_counters_raise_when_capped():
    # tiny spp_cap forces superpoint overflow; tiny fg ratio forces fg overflow
    cfg = ISBNetConfig(**{**_tiny_cfg().__dict__, "filter_bg_thresh": 0.0,
                          "spp_cap": 4, "fg_cap_ratio": 0.01})
    prepared = _make_prepared()
    model = ISBNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), prepared.batch, False)
    out = model.apply(variables, prepared.batch, False)
    assert int(out["ovf_spp_slots"]) > 0
    assert int(out["ovf_fg_voxels"]) > 0


@pytest.mark.slow
def test_inst_cap_overflow_in_losses():
    cfg = ISBNetConfig(**{**_tiny_cfg().__dict__, "filter_bg_thresh": 0.0})
    prepared = _make_prepared(n_objects=3)
    model = ISBNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), prepared.batch, False)
    from gapro_tpu.train.state import create_train_state

    # inst_cap 2 < 3 objects -> overflow voxels counted in the losses dict
    step = make_train_step(model, CriterionConfig(inst_cap=2))
    state = create_train_state(variables)
    _, losses = step(state, prepared, jnp.float32(1e-3))
    assert float(losses["ovf_inst_voxels"]) > 0
    assert "ovf_spp_slots" in losses and "ovf_plan_voxels" in losses
    # counters are observability, not loss terms
    non_ovf = sum(float(v) for k, v in losses.items()
                  if k != "loss" and not k.startswith("ovf_"))
    assert abs(non_ovf - float(losses["loss"])) < 1e-4


def test_gp_cap_counters(monkeypatch):
    pl.reset_overflow_stats()
    rng = np.random.default_rng(0)
    # two overlapping boxes, lots of superpoints so train rows exceed the cap
    n = 6000
    coords = rng.random((n, 3)).astype(np.float32) * 2
    feats = rng.random((n, 3)).astype(np.float32)
    spp = np.arange(n) // 2  # 3000 superpoints
    boxes = np.asarray([[0, 0, 0, 1.2, 2, 2], [0.8, 0, 0, 2, 2, 2]], np.float32)
    cls = np.asarray([1, 2])
    vols = np.prod(boxes[:, 3:] - boxes[:, :3], axis=1)
    cfg = LabelerConfig(max_train=64, max_test=32)
    pl.generate_scene_labels(coords, feats, spp, cls, boxes, vols, cfg=cfg)
    assert pl.OVERFLOW_STATS["gp_train_subsampled"] > 0
    assert pl.OVERFLOW_STATS["gp_test_truncated"] > 0
    pl.reset_overflow_stats()
    assert pl.OVERFLOW_STATS["gp_train_subsampled"] == 0
