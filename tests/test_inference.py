import jax
import jax.numpy as jnp
import numpy as np

from gapro_tpu.models import ISBNet, TestConfig, get_instances
from gapro_tpu.ops.nms import matrix_nms, standard_nms_host, weighted_mask_iou

from tests.test_isbnet_forward import _make_prepared, _tiny_cfg


def test_weighted_mask_iou_matches_expanded():
    rng = np.random.default_rng(0)
    masks = (rng.random((5, 12)) > 0.5).astype(np.float32)
    w = rng.integers(1, 6, 12).astype(np.float32)
    got = np.asarray(weighted_mask_iou(jnp.asarray(masks), jnp.asarray(w)))
    # oracle: expand each superpoint into w copies of voxels
    exp = np.repeat(masks, w.astype(int), axis=1)
    inter = exp @ exp.T
    n = exp.sum(1)
    want = inter / np.maximum(n[:, None] + n[None, :] - inter, 1e-6)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_matrix_nms_suppresses_duplicates():
    # two near-identical masks of the same class + one distinct
    masks = np.zeros((4, 20), np.float32)
    masks[0, :10] = 1
    masks[1, :9] = 1  # heavy overlap with 0
    masks[2, 12:] = 1  # distinct
    masks[3, :] = 0  # invalid row
    cats = np.array([1, 1, 2, -1], np.int32)
    scores = np.array([0.9, 0.8, 0.7, -1.0], np.float32)
    w = np.ones(20, np.float32)
    idx, new_scores, keep = jax.tree_util.tree_map(
        np.asarray,
        matrix_nms(jnp.asarray(masks), jnp.asarray(cats), jnp.asarray(scores),
                   jnp.asarray(w), 4),
    )
    assert keep[:3].all() and not keep[3]
    s = dict(zip(idx.tolist(), new_scores.tolist()))
    assert abs(s[0] - 0.9) < 1e-6  # top kept unchanged
    assert s[1] < 0.3  # duplicate strongly decayed
    assert abs(s[2] - 0.7) < 1e-6  # different class untouched


def test_standard_nms_host():
    masks = np.zeros((3, 10), np.float32)
    masks[0, :6] = 1
    masks[1, :5] = 1
    masks[2, 6:] = 1
    keep = standard_nms_host(masks, np.array([0, 0, 0]), np.array([0.9, 0.5, 0.7]),
                             np.ones(10), threshold=0.2)
    assert 0 in keep and 2 in keep and 1 not in keep


def test_isbnet_inference_end_to_end():
    cfg = _tiny_cfg().__class__(**{**_tiny_cfg().__dict__, "filter_bg_thresh": 0.0})
    prepared = _make_prepared()
    model = ISBNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), prepared.batch, False)
    out = model.apply(
        variables, prepared.batch, method=lambda m, b: m.forward_inference(b, (8, 4))
    )
    assert out["cls_logits"].shape == (1, 12, 19)
    assert out["mask_logits"].shape == (1, 12, cfg.spp_cap)
    assert np.isfinite(np.asarray(out["mask_logits"])).all()

    # host postproc on the original (padded) point arrays
    from gapro_tpu.data import make_synthetic_scene

    n_points = 1100  # 3*200 + 300 + 200
    tcfg = TestConfig(topk=8, topk_insts=16, npoint_thresh=10, score_thresh=0.0)
    point_spp = np.arange(prepared.point2voxel.shape[0]) // 7  # synthetic spp
    instances = get_instances(
        "scene0000_00",
        out,
        prepared.batch,
        point_spp,
        np.asarray(prepared.point2voxel),
        n_points,
        tcfg,
    )
    # untrained net: instances may be empty, but the pipeline must produce
    # well-formed records when any survive
    for inst in instances:
        assert set(inst) == {"scan_id", "label_id", "conf", "pred_mask"}
        assert inst["pred_mask"]["length"] == n_points
        assert 1 <= inst["label_id"] <= 18


def test_sem2ins_classes_emit_semantic_instances():
    """s3dis ceiling/floor path (reference isbnet.py:906-921): classes in
    sem2ins_classes become one conf-1.0 instance each from the semantic
    argmax, superpoint-aligned (majority >= 0.5, model_utils.py:447-470)."""
    cfg = _tiny_cfg().__class__(**{**_tiny_cfg().__dict__, "filter_bg_thresh": 0.0})
    prepared = _make_prepared()
    model = ISBNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), prepared.batch, False)
    out = model.apply(
        variables, prepared.batch, method=lambda m, b: m.forward_inference(b, (8, 4))
    )

    n_points = 1100
    n_pad = prepared.point2voxel.shape[0]
    point_spp = np.arange(n_pad) // 7

    # explicit semantic override: points 0..449 class 0, 450..899 class 1,
    # rest class 5 — with one minority point inside a class-0 superpoint
    # that alignment must flip back
    sem = np.full(n_pad, 5, np.int64)
    sem[:450] = 0
    sem[450:900] = 1
    sem[3] = 5  # minority inside spp 0 (points 0..6 are class 0)

    tcfg = TestConfig(topk=8, topk_insts=16, npoint_thresh=10,
                      score_thresh=0.0, sem2ins_classes=(0, 1))
    instances = get_instances(
        "room_area5", out, prepared.batch, point_spp,
        np.asarray(prepared.point2voxel), n_points, tcfg,
        semantic_preds_points=sem,
    )
    from gapro_tpu.utils.rle import rle_decode

    assert instances[0]["label_id"] == 1 and instances[0]["conf"] == 1.0
    assert instances[1]["label_id"] == 2 and instances[1]["conf"] == 1.0
    m0 = rle_decode(instances[0]["pred_mask"])
    m1 = rle_decode(instances[1]["pred_mask"])
    assert m0[3]  # minority point re-aligned into its superpoint's majority
    assert m0[:7].all() and not m1[:7].any()
    # spp 128 (points 896..902) straddles: 4 class-1 vs 3 class-5 points
    # -> majority class 1 pulls 900-902 in; spp 130 (910..916) is pure
    # class 5 and stays out
    assert m1[450] and m1[899] and m1[902] and not m1[910]

    # derived-from-outputs path (no explicit override): still emits the
    # two semantic instances first, from outputs['semantic_scores'] argmax
    instances2 = get_instances(
        "room_area5", out, prepared.batch, point_spp,
        np.asarray(prepared.point2voxel), n_points, tcfg,
    )
    assert instances2[0]["label_id"] == 1 and instances2[1]["label_id"] == 2
    assert instances2[0]["conf"] == 1.0
    assert instances2[0]["pred_mask"]["length"] == n_points
