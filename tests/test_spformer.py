import jax
import jax.numpy as jnp
import numpy as np

from gapro_tpu.losses.criterion import build_targets
from gapro_tpu.losses.spformer_criterion import SPFormerCriterionConfig, spformer_loss
from gapro_tpu.models.inference import spformer_get_instances
from gapro_tpu.models.spformer import SPFormer, SPFormerConfig

from tests.test_isbnet_forward import _make_prepared
import pytest


def _tiny_spf():
    return SPFormerConfig(
        media=8, blocks=3, num_layer=2, num_query=16, d_model=32,
        nhead=4, hidden_dim=64, spp_cap=256,
    )


def test_spformer_forward_shapes():
    cfg = _tiny_spf()
    prepared = _make_prepared()
    model = SPFormer(cfg)
    variables = model.init(jax.random.PRNGKey(0), prepared.batch, False)
    out = model.apply(variables, prepared.batch, False)
    L = cfg.num_layer + 1
    assert out["labels"].shape == (L, 1, 16, 19)
    assert out["scores"].shape == (L, 1, 16)
    assert out["masks"].shape == (L, 1, 16, 256)
    assert np.isfinite(np.asarray(out["masks"])).all()
    assert np.isfinite(np.asarray(out["labels"])).all()
    # invalid superpoint slots contribute nothing to attention: all-padded
    # rows would otherwise NaN the softmax
    assert out["mu_pred"].shape == (prepared.batch.n_spp,)


@pytest.mark.slow
def test_spformer_loss_and_grads():
    cfg = _tiny_spf()
    crit = SPFormerCriterionConfig(inst_cap=16)
    prepared = _make_prepared()
    model = SPFormer(cfg)
    variables = model.init(jax.random.PRNGKey(0), prepared.batch, False)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            prepared.batch, True, mutable=["batch_stats"],
        )
        targets = build_targets(
            prepared.voxel_instance, prepared.voxel_semantic,
            prepared.batch.coords_float, prepared.batch.spp,
            prepared.batch.batch_idx, prepared.batch.valid,
            out["sp_dense_idx"], prepared.batch.n_spp, crit.inst_cap,
            voxel_prob=prepared.voxel_prob, voxel_mu=prepared.voxel_mu,
            voxel_var=prepared.voxel_var, voxel_rgb=prepared.voxel_rgb,
        )
        losses = spformer_loss(out, targets, crit)
        return losses["loss"], losses

    (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(loss)), losses
    for k in ("cls_loss", "bce_loss", "dice_loss", "score_loss", "levelset_loss", "kl_loss"):
        assert np.isfinite(float(losses[k])), k
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # the decoder params receive gradient
    gq = grads["decoder"]["query"]
    assert float(jnp.abs(gq).sum()) > 0


def test_spformer_predict_records():
    cfg = _tiny_spf()
    prepared = _make_prepared()
    model = SPFormer(cfg)
    variables = model.init(jax.random.PRNGKey(0), prepared.batch, False)
    out = model.apply(variables, prepared.batch, False)
    point_spp = np.arange(prepared.point2voxel.shape[0]) // 7
    insts = spformer_get_instances(
        "scene0", out, prepared.batch, point_spp,
        np.asarray(prepared.point2voxel), 1100,
        topk_insts=8, npoint_thr=5,
    )
    for inst in insts:
        assert set(inst) == {"scan_id", "label_id", "conf", "pred_mask"}
        assert 1 <= inst["label_id"] <= 18
        assert inst["pred_mask"]["length"] == 1100
