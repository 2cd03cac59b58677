import numpy as np

from gapro_tpu.eval import PointWiseEval, S3DISEval, ScanNetEval
from gapro_tpu.utils import rle_decode, rle_encode


def test_rle_roundtrip():
    rng = np.random.default_rng(0)
    for n in (1, 7, 100, 1000):
        mask = rng.random(n) > 0.6
        dec = rle_decode(rle_encode(mask))
        np.testing.assert_array_equal(dec, mask)
    # string counts (reference CPU encoder format)
    mask = np.array([0, 1, 1, 0, 1], bool)
    r = rle_encode(mask)
    r["counts"] = " ".join(str(x) for x in r["counts"])
    np.testing.assert_array_equal(rle_decode(r), mask)


def _scene(n=1000, n_inst=3, cls_of=None, seed=0):
    """GT with n_inst instances of >=150 points each."""
    rng = np.random.default_rng(seed)
    if cls_of:
        n_inst = len(cls_of)
    sem = np.full(n, 18, np.int64)  # background
    inst = np.full(n, -100, np.int64)
    start = 0
    for i in range(n_inst):
        sz = 150 + int(rng.integers(0, 50))
        c = cls_of[i] if cls_of else int(rng.integers(0, 18))
        sem[start : start + sz] = c
        inst[start : start + sz] = i
        start += sz
    return sem, inst


def _pred(mask_slice, n, label_id, conf):
    m = np.zeros(n, bool)
    m[mask_slice] = True
    return dict(scan_id="s", label_id=label_id, conf=conf, pred_mask=rle_encode(m))


def test_scannet_eval_perfect_predictions():
    sem, inst = _scene(cls_of=[2, 2, 5])
    preds = []
    for i in range(3):
        m = inst == i
        preds.append(dict(scan_id="s", label_id=int(sem[m][0]) + 1, conf=0.9,
                          pred_mask=rle_encode(m)))
    ev = ScanNetEval()
    res = ev.evaluate([preds], [sem], [inst])
    assert res["all_ap"] > 0.99 or np.isnan(res["all_ap"]) is False
    assert abs(res["classes"]["chair"]["ap50"] - 1.0) < 1e-6
    assert abs(res["all_ap_50%"] - 1.0) < 1e-6


def test_scannet_eval_false_positive_hurts():
    sem, inst = _scene(cls_of=[2, 2, 2])
    n = len(sem)
    preds = [
        _pred(slice(0, int((inst == 0).sum())), n, 3, 0.9),
    ]
    # perfect masks for all three gts
    good = []
    for i in range(3):
        m = inst == i
        good.append(dict(scan_id="s", label_id=3, conf=0.8, pred_mask=rle_encode(m)))
    # bogus low-IoU prediction inside gt 0's region (not void, so a real FP;
    # a pure-background mask would be forgiven via proportion_ignore)
    bogus = _pred(slice(0, 120), n, 3, 0.95)
    ev = ScanNetEval()
    full = ev.evaluate([good], [sem], [inst])
    with_fp = ScanNetEval().evaluate([good + [bogus]], [sem], [inst])
    assert with_fp["classes"]["chair"]["ap50"] < full["classes"]["chair"]["ap50"]


def test_scannet_eval_wrong_class_is_fp():
    sem, inst = _scene(cls_of=[2])
    m = inst == 0
    right = dict(scan_id="s", label_id=3, conf=0.9, pred_mask=rle_encode(m))
    wrong = dict(scan_id="s", label_id=7, conf=0.9, pred_mask=rle_encode(m))
    r1 = ScanNetEval().evaluate([[right]], [sem], [inst])
    r2 = ScanNetEval().evaluate([[wrong]], [sem], [inst])
    assert r1["classes"]["chair"]["ap50"] == 1.0
    assert r2["classes"]["chair"]["ap50"] == 0.0


def test_pointwise_eval():
    ev = PointWiseEval(num_classes=4)
    gt = np.array([0, 1, 2, 3, -100])
    pred = np.array([0, 1, 2, 2, 1])
    off_gt = np.zeros((5, 6))
    off_pred = np.ones((5, 6)) * 0.5
    inst = np.array([0, 0, 1, 1, -100])
    ev.update(pred, off_pred, gt, off_gt, inst)
    miou, acc, mae = ev.get_eval()
    assert abs(acc - 75.0) < 1e-6
    # classes 0,1 perfect; class2: tp=1 fp=1 -> 50; class3: 0
    assert abs(miou - (100 + 100 + 50 + 0) / 4) < 1e-6
    # reference convention: sum of |err| over the 6 box-corner components
    # per instance point (point_wise_eval.py:89-92) -> 6 * 0.5
    assert abs(mae - 3.0) < 1e-6


def test_s3dis_eval_perfect():
    sem = np.concatenate([np.full(300, 7), np.full(300, 8)])
    inst = np.concatenate([np.full(300, 0), np.full(300, 1)])
    preds = [
        _pred(slice(0, 300), 600, 8, 0.9),
        _pred(slice(300, 600), 600, 9, 0.8),
    ]
    mucov, mwcov, prec, rec = S3DISEval().evaluate([preds], [sem], [inst])
    assert abs(mucov - 1.0) < 1e-6
    assert abs(mwcov - 1.0) < 1e-6
    assert abs(prec - 1.0) < 1e-6
    assert abs(rec - 1.0) < 1e-6
