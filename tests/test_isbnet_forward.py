import jax
import jax.numpy as jnp
import numpy as np

from gapro_tpu.data import make_synthetic_scene
from gapro_tpu.models import ISBNet, ISBNetConfig
from gapro_tpu.models.prepare import points_to_batch_np, prepare_voxel_batch
import pytest


def _tiny_cfg():
    return ISBNetConfig(
        channels=8,
        num_blocks=3,
        n_sample_pa1=64,
        n_queries=16,
        neighbor=8,
        dec_dim=32,
        mask_dim_out=8,
        spp_cap=256,
    )


def _make_prepared(n_objects=3, seed=0, batch_scenes=1):
    scenes = []
    for i in range(batch_scenes):
        s = make_synthetic_scene(
            seed=seed + i, n_objects=n_objects, points_per_object=200, n_floor=300, n_wall=200
        )
        scenes.append(
            dict(xyz=s.xyz, rgb=s.rgb, spp=s.spp, semantic=s.semantic_label, instance=s.instance_label)
        )
    pb = points_to_batch_np(scenes, voxel_scale=10)
    prepared = prepare_voxel_batch(
        jax.tree_util.tree_map(jnp.asarray, pb),
        pb.coords.shape[0],
        batch_scenes,
        3,
        256,
        0.7,
    )
    return prepared


def test_isbnet_forward_shapes_and_masks():
    cfg = _tiny_cfg()
    prepared = _make_prepared()
    model = ISBNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), prepared.batch, False)
    out = model.apply(variables, prepared.batch, False)

    v = prepared.batch.feats.shape[0]
    assert out["semantic_scores"].shape == (v, 19)
    assert out["corners_offset"].shape == (v, 6)
    assert out["box_conf"].shape == (v,)
    assert out["cls_logits"].shape == (1, cfg.n_queries, 19)
    assert out["conf_logits"].shape == (1, cfg.n_queries)
    assert out["query_box_preds"].shape == (1, cfg.n_queries, 6)
    assert out["mask_logits"].shape == (1, cfg.n_queries, cfg.spp_cap)
    assert out["mu_pred"].shape == (prepared.batch.n_spp,)

    nv = int(prepared.batch.plan.levels[0].grid.num_voxels)
    assert np.isfinite(np.asarray(out["semantic_scores"])[:nv]).all()
    assert np.isfinite(np.asarray(out["mask_logits"])).all()
    # padded voxels produce zero semantic scores
    assert (np.asarray(out["semantic_scores"])[nv:] == 0).all()


@pytest.mark.slow
def test_isbnet_forward_batch2():
    cfg = _tiny_cfg()
    prepared = _make_prepared(batch_scenes=2)
    model = ISBNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), prepared.batch, False)
    out = model.apply(variables, prepared.batch, False)
    assert out["cls_logits"].shape == (2, cfg.n_queries, 19)
    assert out["mask_logits"].shape == (2, cfg.n_queries, cfg.spp_cap)
    assert np.isfinite(np.asarray(out["mask_logits"])).all()


def test_isbnet_train_mode_has_batch_stats():
    cfg = _tiny_cfg()
    prepared = _make_prepared()
    model = ISBNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), prepared.batch, False)
    out, mutated = model.apply(
        variables, prepared.batch, True, mutable=["batch_stats"]
    )
    assert "batch_stats" in mutated
    assert np.isfinite(np.asarray(out["mask_logits"])).all()
