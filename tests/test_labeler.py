import numpy as np

from gapro_tpu.data import make_synthetic_scene
from gapro_tpu.eval import pseudo_label_miou_scene
from gapro_tpu.labeler import LabelerConfig, generate_scene_labels, instance_info
from gapro_tpu.labeler.boxes import box_giou_cross, is_box1_in_box2


def test_box_giou_cross():
    b1 = np.array([[0, 0, 0, 2, 2, 2]], np.float32)
    b2 = np.array([[1, 1, 1, 3, 3, 3], [10, 10, 10, 11, 11, 11]], np.float32)
    iou, giou = box_giou_cross(b1, b2)
    np.testing.assert_allclose(iou[0, 0], 1.0 / 15.0, rtol=1e-4)
    assert iou[0, 1] == 0.0
    assert giou[0, 1] < 0  # disjoint -> negative giou


def test_is_box1_in_box2():
    inner = np.array([0.5, 0.5, 0.5, 1.5, 1.5, 1.5])
    outer = np.array([0.0, 0.0, 0.0, 2.0, 2.0, 2.0])
    assert is_box1_in_box2(inner, outer)
    assert not is_box1_in_box2(outer, inner)


def test_instance_info_scannet_remap():
    xyz = np.array([[0, 0, 0], [1, 1, 1], [5, 5, 5], [6, 6, 6]], np.float32)
    inst = np.array([0, 0, 1, 1])
    sem = np.array([4, 4, 9, 9])
    n, cls, boxes, vols, corners = instance_info(xyz, inst, sem)
    assert n == 2
    np.testing.assert_array_equal(cls, [2, 7])  # -2 remap
    np.testing.assert_allclose(boxes[0], [0, 0, 0, 1, 1, 1])
    np.testing.assert_allclose(vols[0], 1.0)
    np.testing.assert_allclose(corners[0, :3], [0, 0, 0])  # min - xyz at min point
    np.testing.assert_allclose(corners[1, 3:], [0, 0, 0])  # max - xyz at max point


def test_generate_scene_labels_end_to_end():
    scene = make_synthetic_scene(seed=0, n_objects=6, points_per_object=800, n_floor=1500, n_wall=1200)
    info = instance_info(scene.xyz, scene.instance_label, scene.semantic_label)
    assert info is not None
    _, cls, boxes, vols, _ = info

    cfg = LabelerConfig(training_iter=30)
    feats = np.concatenate([scene.xyz, scene.rgb], axis=1)
    sem, inst, prob, mu, var, spp_inv = generate_scene_labels(
        scene.xyz, feats, scene.spp, cls, boxes, vols, cfg=cfg
    )

    assert sem.shape == inst.shape == prob.shape == (len(scene.xyz),)
    # pseudo labels must be meaningfully correct on a scene with mild overlap
    gt_sem = scene.semantic_label.copy()
    gt_sem[gt_sem >= 2] -= 2
    gt_sem[(gt_sem == 0) | (gt_sem == 1)] = 18  # walls/floor -> bg class
    ious = pseudo_label_miou_scene(gt_sem, scene.instance_label, sem, inst)
    assert len(ious) == 6
    assert float(np.mean(ious)) > 0.65, ious

    # background points (floor slab bottom) mostly labeled background class 18
    floor_pts = scene.xyz[:, 2] < 0.04
    frac_bg = (sem[floor_pts] == 18).mean()
    assert frac_bg > 0.7, frac_bg

    # probabilities in [0, 1]; determined points have prob 1
    assert prob.min() >= 0.0 and prob.max() <= 1.0 + 1e-6

    # GP uncertainty outputs: any spp touched by GP has var != -100
    assert ((var != -100.0).sum() > 0) == ((mu != -100.0).sum() > 0)


def test_generate_scene_labels_no_overlap_needs_no_gp():
    # objects far apart -> every fg point in exactly one box -> no GP fits,
    # labels exact
    scene = make_synthetic_scene(
        seed=3, n_objects=4, points_per_object=500, n_floor=800, n_wall=600, overlap_fraction=0.0
    )
    info = instance_info(scene.xyz, scene.instance_label, scene.semantic_label)
    _, cls, boxes, vols, _ = info
    feats = np.concatenate([scene.xyz, scene.rgb], axis=1)
    sem, inst, prob, mu, var, _ = generate_scene_labels(
        scene.xyz, feats, scene.spp, cls, boxes, vols, cfg=LabelerConfig(training_iter=10)
    )
    gt_sem = scene.semantic_label.copy()
    gt_sem[gt_sem >= 2] -= 2
    gt_sem[(gt_sem == 0) | (gt_sem == 1)] = 18
    ious = pseudo_label_miou_scene(gt_sem, scene.instance_label, sem, inst)
    assert float(np.mean(ious)) > 0.9, ious


def test_packed_rgb_submit_bit_identical(monkeypatch):
    """The lossless uint8-grid rgb H2D packing (pipeline.py:_try_pack_rgb +
    _occupancy_and_pool rgb_packed) must yield EXACTLY the labels of the
    flat 3-column layout — the pack is a wire format, not an approximation."""
    from gapro_tpu.labeler.pipeline import _try_pack_rgb

    scene = make_synthetic_scene(seed=3, n_objects=5, points_per_object=600,
                                 n_floor=1200, n_wall=900)
    # synthetic rgb sits on the uint8 grid by construction
    assert _try_pack_rgb(scene.rgb) is not None
    # and a perturbed color must refuse to pack
    bad = scene.rgb.copy()
    bad[0, 0] += 1e-3
    assert _try_pack_rgb(bad) is None

    info = instance_info(scene.xyz, scene.instance_label, scene.semantic_label)
    _, cls, boxes, vols, _ = info
    cfg = LabelerConfig(training_iter=10)
    feats = np.concatenate([scene.xyz, scene.rgb], axis=1)

    outs = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("GAPRO_PACK_RGB", flag)
        outs[flag] = generate_scene_labels(
            scene.xyz, feats, scene.spp, cls, boxes, vols, cfg=cfg)
    for a, b in zip(outs["1"], outs["0"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_indexed_vs_host_fit_path_identical():
    """The device-indexed GP fit path (round 5: feats stay on device, rows
    gathered by index inside `_fit_gp_batch_indexed`) must produce EXACTLY
    the host-packed path's results — the index buffer is a wire format for
    the same row selection (shared `_subsampled_job_rows`, per-job rng)."""
    from gapro_tpu.labeler import pipeline as pl

    scene = make_synthetic_scene(seed=1, n_objects=6, points_per_object=700,
                                 n_floor=1400, n_wall=1000)
    info = instance_info(scene.xyz, scene.instance_label, scene.semantic_label)
    _, cls, boxes, vols, _ = info
    cfg = LabelerConfig(training_iter=10)
    feats = np.concatenate([scene.xyz, scene.rgb], axis=1)
    h = pl.submit_scene(scene.xyz, feats, scene.spp, cls, boxes, vols,
                        cfg=cfg)
    res = pl.enumerate_scene(h, cfg)
    assert len(res.jobs) > 0, "scene must produce GP jobs"

    r_idx = pl._fit_jobs_batched(res.jobs, res.feats_spp, cfg)
    r_host = pl._fit_jobs_batched(res.jobs, np.asarray(res.feats_spp), cfg)
    for j, (a, b) in enumerate(zip(r_idx, r_host)):
        for name, x, y in zip(("probs", "conf", "labels", "mu", "var"), a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                          err_msg=f"job {j} {name}")


def test_window_batched_submit_bit_identical(monkeypatch):
    """submit_scenes_batched (one H2D put + one vmapped occupancy program
    per same-shape window group) must yield EXACTLY the per-scene
    submit_scene path's labels — both through direct handles and through
    the windowed stream. Mixed shapes exercise the singleton fallback."""
    from gapro_tpu.labeler.pipeline import (generate_scene_labels_stream,
                                            resolve_scene, submit_scene,
                                            submit_scenes_batched)

    cfg = LabelerConfig(training_iter=10)

    def kwargs_of(seed, ppo):
        scene = make_synthetic_scene(seed=seed, n_objects=4,
                                     points_per_object=ppo, n_floor=900,
                                     n_wall=700)
        info = instance_info(scene.xyz, scene.instance_label,
                             scene.semantic_label)
        _, cls, boxes, vols, _ = info
        feats = np.concatenate([scene.xyz, scene.rgb], axis=1)
        return dict(coords=scene.xyz, gp_feats=feats, spp=scene.spp,
                    instance_cls=cls, instance_box=boxes,
                    instance_box_volume=vols)

    # 3 same-bucket scenes (one vmapped group) + 1 smaller (singleton)
    scenes = [kwargs_of(s, 500) for s in (0, 1, 2)] + [kwargs_of(7, 120)]
    hs_b = submit_scenes_batched(scenes, cfg)
    hs_s = [submit_scene(cfg=cfg, **s) for s in scenes]
    assert sum(h.occ_batch is not None for h in hs_b) >= 3
    for i, (hb, hsg) in enumerate(zip(hs_b, hs_s)):
        for a, b in zip(resolve_scene(hb, cfg), resolve_scene(hsg, cfg)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=f"scene {i}")

    outs = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("GAPRO_SUBMIT_BATCH", flag)
        outs[flag] = [labels for _, labels in
                      generate_scene_labels_stream(iter(scenes), cfg,
                                                   window=2)]
    assert len(outs["1"]) == len(outs["0"]) == 4
    for l1, l0 in zip(outs["1"], outs["0"]):
        for a, b in zip(l1, l0):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
