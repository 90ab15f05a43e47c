"""Hand-verified golden tests for the numpy COCOeval implementation."""
import numpy as np
import pytest

from basedet_tpu.evaluators.coco_metrics import evaluate_coco_map


def gt(bbox, area=None, iscrowd=0):
    x, y, w, h = bbox
    return dict(bbox=bbox, area=area if area is not None else w * h, iscrowd=iscrowd)


def dt(bbox, score):
    return dict(bbox=bbox, score=score)


def test_perfect_prediction():
    g = {(1, 1): [gt([10, 10, 50, 50])]}
    d = {(1, 1): [dt([10, 10, 50, 50], 0.9)]}
    r = evaluate_coco_map(g, d, [1], [1])
    assert r["AP"] == pytest.approx(1.0)
    assert r["AP50"] == pytest.approx(1.0)
    assert r["AR@100"] == pytest.approx(1.0)


def test_no_predictions():
    g = {(1, 1): [gt([10, 10, 50, 50])]}
    r = evaluate_coco_map(g, {}, [1], [1])
    assert r["AP"] == pytest.approx(0.0)


def test_iou_cutoff():
    # det IoU with gt = 0.6 → matches at thresholds .50/.55/.60 only
    # gt [0,0,100,100]; det [0,0,60,100] → inter 6000, union 10000 → iou .6
    g = {(1, 1): [gt([0, 0, 100, 100])]}
    d = {(1, 1): [dt([0, 0, 60, 100], 0.9)]}
    r = evaluate_coco_map(g, d, [1], [1])
    assert r["AP50"] == pytest.approx(1.0)
    assert r["AP75"] == pytest.approx(0.0)
    assert r["AP"] == pytest.approx(0.3, abs=1e-6)


def test_fp_after_tp_precision():
    # one gt, two dets: high-score TP then FP → AP50 stays 1.0
    # (precision at every achieved recall level is 1.0)
    g = {(1, 1): [gt([0, 0, 10, 10])]}
    d = {(1, 1): [dt([0, 0, 10, 10], 0.9), dt([50, 50, 10, 10], 0.5)]}
    r = evaluate_coco_map(g, d, [1], [1])
    assert r["AP50"] == pytest.approx(1.0)


def test_fp_before_tp_precision():
    # FP has HIGHER score → precision at recall 1.0 is 0.5 ⇒ AP50 ≈ 0.5
    g = {(1, 1): [gt([0, 0, 10, 10])]}
    d = {(1, 1): [dt([50, 50, 10, 10], 0.9), dt([0, 0, 10, 10], 0.5)]}
    r = evaluate_coco_map(g, d, [1], [1])
    # 101-pt interp: precision 0.5 for all recall points <= 1.0
    assert r["AP50"] == pytest.approx(0.5, abs=0.01)


def test_missed_gt_recall():
    # 2 gts, only 1 detected → recall 0.5, precision 1 up to recall 0.5
    g = {(1, 1): [gt([0, 0, 10, 10]), gt([100, 100, 10, 10])]}
    d = {(1, 1): [dt([0, 0, 10, 10], 0.9)]}
    r = evaluate_coco_map(g, d, [1], [1])
    # AP50 = mean of precision over 101 recall pts: 1.0 for recall <= 0.5
    # (51 points), 0 beyond → ≈ 51/101
    assert r["AP50"] == pytest.approx(51 / 101, abs=0.01)
    assert r["AR@100"] == pytest.approx(0.5)


def test_crowd_gt_not_penalized():
    # crowd gt: matching det is ignored (no TP, no FP); AP determined by
    # the real gt only
    g = {(1, 1): [gt([0, 0, 10, 10]), gt([100, 100, 50, 50], iscrowd=1)]}
    d = {
        (1, 1): [
            dt([0, 0, 10, 10], 0.9),
            dt([100, 100, 50, 50], 0.8),  # hits the crowd region
        ]
    }
    r = evaluate_coco_map(g, d, [1], [1])
    assert r["AP"] == pytest.approx(1.0)


def test_area_ranges():
    # small gt (16x16=256 < 1024) only → APs defined, APl undefined (-1)
    g = {(1, 1): [gt([0, 0, 16, 16])]}
    d = {(1, 1): [dt([0, 0, 16, 16], 0.9)]}
    r = evaluate_coco_map(g, d, [1], [1])
    assert r["APs"] == pytest.approx(1.0)
    assert r["APl"] == -1.0


def test_multiclass_mean():
    # class 1 perfect, class 2 missed → AP = mean(1, 0) = 0.5
    g = {(1, 1): [gt([0, 0, 10, 10])], (1, 2): [gt([50, 50, 10, 10])]}
    d = {(1, 1): [dt([0, 0, 10, 10], 0.9)]}
    r = evaluate_coco_map(g, d, [1], [1, 2])
    assert r["AP"] == pytest.approx(0.5)


def test_native_batched_matches_python_fallback():
    """The C++ coco_match_area path must reproduce the pure-Python
    evaluation bit-for-bit across all 12 metrics (crowd gts included)."""
    import numpy as np

    import basedet_tpu.native.build as nb
    from basedet_tpu.evaluators import coco_metrics as cm

    rng = np.random.default_rng(7)
    img_ids = list(range(40))
    cats = list(range(1, 9))
    gt, dt = {}, {}
    for img in img_ids:
        for _ in range(int(rng.integers(0, 6))):
            c = int(rng.integers(1, 9))
            x, y = rng.uniform(0, 300, 2)
            w, h = rng.uniform(5, 150, 2)
            gt.setdefault((img, c), []).append(
                dict(bbox=[x, y, w, h], area=w * h,
                     iscrowd=int(rng.random() < 0.1))
            )
            dt.setdefault((img, c), []).append(
                dict(bbox=[x + rng.uniform(-3, 3), y, w, h],
                     score=float(rng.random()), area=w * h)
            )
        for _ in range(int(rng.integers(0, 20))):
            c = int(rng.integers(1, 9))
            x, y = rng.uniform(0, 300, 2)
            w, h = rng.uniform(5, 150, 2)
            dt.setdefault((img, c), []).append(
                dict(bbox=[x, y, w, h], score=float(rng.random()), area=w * h)
            )

    res_native = cm.evaluate_coco_map(gt, dt, img_ids, cats)
    saved = nb._lib, nb._tried
    try:
        nb._lib, nb._tried = None, True  # force the Python fallback
        res_py = cm.evaluate_coco_map(gt, dt, img_ids, cats)
    finally:
        nb._lib, nb._tried = saved
    assert res_native.keys() == res_py.keys()
    for k in res_py:
        assert abs(res_py[k] - res_native[k]) < 1e-12, k
