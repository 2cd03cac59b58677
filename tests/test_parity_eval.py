"""Cross-implementation parity: our ScanNet AP harness vs the reference's.

The reference harness (ISBNet/isbnet/evaluation/instance_eval.py:43-221) is
pure numpy and runs on this host; both evaluators consume identical random
prediction dumps and must agree on every AP/RC number to float precision.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
import ref_shim  # noqa: E402

from gapro_tpu.eval.instance_eval import SCANNET_INSTANCE_CLASSES, ScanNetEval  # noqa: E402
from gapro_tpu.utils.rle import rle_encode  # noqa: E402


def _random_scene(rng, n_points=3000, n_inst=8, n_pred=12):
    """Random GT + predictions exercising the benchmark's edge rules:
    tiny GT (< min_region_size), void overlap, ignore labels, duplicate
    matches, sub-threshold masks."""
    sem = np.full(n_points, 18, np.int32)  # background
    inst = np.full(n_points, -100, np.int32)
    start = 0
    gt_slices = []
    for i in range(n_inst):
        # include some tiny instances (< 100 pts) to hit the min-region filter
        size = int(rng.choice([30, 80, 150, 300, 500]))
        if start + size > n_points - 200:
            break
        cls = int(rng.integers(0, 18))
        sem[start:start + size] = cls
        inst[start:start + size] = i
        gt_slices.append((start, size))
        start += size
    # some ignore points
    ign = rng.choice(n_points, size=n_points // 20, replace=False)
    sem[ign] = -100
    inst[ign] = -100

    preds = []
    for _ in range(n_pred):
        mask = np.zeros(n_points, np.uint8)
        if gt_slices and rng.random() < 0.8:
            s, sz = gt_slices[int(rng.integers(0, len(gt_slices)))]
            # jittered window around a GT instance (partial overlap)
            lo = max(0, s + int(rng.integers(-sz // 2, sz // 2)))
            hi = min(n_points, lo + sz + int(rng.integers(-sz // 3, sz // 3 + 1)))
            mask[lo:hi] = 1
        else:
            lo = int(rng.integers(0, n_points - 300))
            mask[lo:lo + int(rng.integers(30, 300))] = 1
        preds.append(dict(
            scan_id="scene",
            label_id=int(rng.integers(1, 19)),
            conf=float(rng.random()),
            pred_mask=rle_encode(mask),
        ))
    return preds, sem, inst


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ap_parity_fuzz(seed):
    rng = np.random.default_rng(seed)
    n_scenes = 4
    scenes = [_random_scene(rng) for _ in range(n_scenes)]
    pred_insts = [s[0] for s in scenes]
    sems = [s[1] for s in scenes]
    insts = [s[2] for s in scenes]

    ref_mod = ref_shim.load_isbnet("evaluation.instance_eval")
    ref_eval = ref_mod.ScanNetEval(list(SCANNET_INSTANCE_CLASSES))
    # deep copies: the reference mutates its gt arrays in place
    ref = ref_eval.evaluate(
        [list(p) for p in pred_insts],
        [s.copy() for s in sems],
        [i.copy() for i in insts],
    )

    ours = ScanNetEval().evaluate(pred_insts, sems, insts)

    for key in ("all_ap", "all_ap_50%", "all_ap_25%"):
        assert ours[key] == pytest.approx(ref[key], abs=1e-9), key
    for ln in SCANNET_INSTANCE_CLASSES:
        for ok, rk in (("ap", "ap"), ("ap50", "ap50%"), ("ap25", "ap25%")):
            a, b = ours["classes"][ln][ok], ref["classes"][ln][rk]
            if np.isnan(b):
                assert np.isnan(a), (ln, ok)
            else:
                assert a == pytest.approx(b, abs=1e-9), (ln, ok)


def test_ap_parity_perfect_predictions():
    """Exact GT masks as predictions -> both evals say AP == 1 for present classes."""
    rng = np.random.default_rng(7)
    n_points = 2000
    sem = np.full(n_points, 18, np.int32)
    inst = np.full(n_points, -100, np.int32)
    preds = []
    for i, cls in enumerate([2, 5, 5, 11]):
        s = i * 400
        sem[s:s + 350] = cls
        inst[s:s + 350] = i
        mask = np.zeros(n_points, np.uint8)
        mask[s:s + 350] = 1
        preds.append(dict(scan_id="scene", label_id=cls + 1,
                          conf=float(rng.random()), pred_mask=rle_encode(mask)))

    ref_mod = ref_shim.load_isbnet("evaluation.instance_eval")
    ref = ref_mod.ScanNetEval(list(SCANNET_INSTANCE_CLASSES)).evaluate(
        [preds], [sem.copy()], [inst.copy()])
    ours = ScanNetEval().evaluate([preds], [sem], [inst])
    assert ours["all_ap"] == pytest.approx(ref["all_ap"], abs=1e-9)
    assert ours["all_ap"] == pytest.approx(1.0)


def _attach_boxes(preds, coords):
    """Reference predict_by_feat attaches pred['box'] = AABB of the masked
    points (SPFormer/spformer/model/spformer.py:236); evaluate_box asserts
    its presence."""
    from gapro_tpu.utils.rle import rle_decode

    out = []
    for p in preds:
        m = rle_decode(p["pred_mask"]).astype(bool)
        if m.any():
            pts = coords[m]
            box = np.concatenate([pts.min(0), pts.max(0)])
        else:
            box = np.zeros(6)
        out.append({**p, "box": box})
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_box_ap_parity_fuzz(seed):
    """Our evaluate_box vs the runnable reference harness
    (SPFormer/spformer/evaluation/instance_eval.py:347-457,563-591)."""
    rng = np.random.default_rng(100 + seed)
    n_scenes = 3
    scenes = [_random_scene(rng) for _ in range(n_scenes)]
    coords = [rng.normal(size=(len(s[1]), 3)).astype(np.float32) * 3.0
              for s in scenes]
    # unique scan ids per scene: the reference keys its greedy visited set
    # by f"{scan_id}_{per_scene_idx}" — duplicate scan ids alias across
    # scenes there, which real datasets never produce
    pred_insts = [
        [{**p, "scan_id": f"scene{si:04d}"} for p in _attach_boxes(s[0], c)]
        for si, (s, c) in enumerate(zip(scenes, coords))
    ]
    sems = [s[1] for s in scenes]
    insts = [s[2] for s in scenes]

    ref_mod = ref_shim.load_spformer("evaluation.instance_eval")
    ref_eval = ref_mod.ScanNetEval(list(SCANNET_INSTANCE_CLASSES))
    ref = ref_eval.evaluate_box(
        [list(p) for p in pred_insts],
        [c.copy() for c in coords],
        [s.copy() for s in sems],
        [i.copy() for i in insts],
    )

    ours = ScanNetEval().evaluate_box(pred_insts, coords, sems, insts)

    for key in ("all_ap", "all_ap_50%", "all_ap_25%"):
        assert ours[key] == pytest.approx(ref[key], abs=1e-9), key
    for ln in SCANNET_INSTANCE_CLASSES:
        for ok, rk in (("ap", "ap"), ("ap50", "ap50%"), ("ap25", "ap25%")):
            a, b = ours["classes"][ln][ok], ref["classes"][ln][rk]
            if np.isnan(b):
                assert np.isnan(a), (ln, ok)
            else:
                assert a == pytest.approx(b, abs=1e-9), (ln, ok)


def test_box_ap_without_pred_boxes_falls_back_to_mask_aabb():
    """Our harness derives the pred AABB from the mask when 'box' is absent
    — identical numbers to explicitly attached boxes."""
    rng = np.random.default_rng(5)
    preds, sem, inst = _random_scene(rng)
    coords = rng.normal(size=(len(sem), 3)).astype(np.float32) * 3.0
    with_boxes = ScanNetEval().evaluate_box(
        [_attach_boxes(preds, coords)], [coords], [sem], [inst])
    without = ScanNetEval().evaluate_box([preds], [coords], [sem], [inst])
    assert without["all_ap"] == pytest.approx(with_boxes["all_ap"], abs=1e-12)
