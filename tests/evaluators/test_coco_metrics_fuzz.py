"""Randomized cross-validation of evaluate_coco_map against an INDEPENDENT
transcription of pycocotools' COCOeval (bbox).

pycocotools itself is not installable in this sandbox (no network), so this
oracle is a second, structurally-different implementation written directly
from the pycocotools algorithm (cocoeval.py evaluateImg/accumulate/summarize
semantics: greedy per-threshold matching with the crowd re-match and
ignored-gt break rules, full (T, R, K, A, M) precision/recall accumulation,
101-point interpolation, -1 sentinel means). Agreement on large randomized
fixtures — crowd annotations, segmentation-style areas != w*h, score ties,
all area bins, hundreds of detections — is the strongest grounding available
offline; tools/make_pycocotools_golden.py turns the same fixture into a real
pycocotools golden the day that package exists.

Reference consumer: /root/reference/basedet/evaluators/coco_eval.py:153-172.
"""
import numpy as np
import pytest

from basedet_tpu.evaluators.coco_metrics import (
    AREA_RANGES,
    IOU_THRS,
    MAX_DETS,
    RECALL_THRS,
    evaluate_coco_map,
)

AREA_KEYS = list(AREA_RANGES)  # all, small, medium, large


# -- independent COCOeval transcription (dict-of-annotation organisation) -----


def _iou_one(d, g, crowd):
    dx1, dy1, dw, dh = d
    gx1, gy1, gw, gh = g
    iw = min(dx1 + dw, gx1 + gw) - max(dx1, gx1)
    ih = min(dy1 + dh, gy1 + gh) - max(dy1, gy1)
    if iw <= 0 or ih <= 0:
        return 0.0
    inter = iw * ih
    union = dw * dh if crowd else dw * dh + gw * gh - inter
    return inter / union if union > 0 else 0.0


def oracle_cocoeval(gt_anns, dt_anns, img_ids, cat_ids):
    """COCOeval bbox, transcribed as plain loops. gt_anns/dt_anns: lists of
    annotation dicts (image_id, category_id, bbox xywh, area, iscrowd /
    score). Returns the 12 standard metrics."""
    T, R = len(IOU_THRS), len(RECALL_THRS)
    K, A, M = len(cat_ids), len(AREA_KEYS), len(MAX_DETS)
    max_det_cap = MAX_DETS[-1]

    gts = {}
    dts = {}
    for ann in gt_anns:
        gts.setdefault((ann["image_id"], ann["category_id"]), []).append(ann)
    for ann in dt_anns:
        dts.setdefault((ann["image_id"], ann["category_id"]), []).append(ann)

    def evaluate_img(img, cat, a_rng, max_det):
        gt = list(gts.get((img, cat), []))
        dt = list(dts.get((img, cat), []))
        if len(gt) == 0 and len(dt) == 0:
            return None
        for g in gt:
            ignore = bool(g.get("iscrowd", 0))
            g["_ignore"] = 1 if (
                ignore or g["area"] < a_rng[0] or g["area"] > a_rng[1]
            ) else 0
        # sort gt: ignored last; dt: score desc (both mergesort-stable)
        gt = sorted(gt, key=lambda g: g["_ignore"])
        dt = sorted(dt, key=lambda d: -d["score"])[:max_det]
        iscrowd = [int(g.get("iscrowd", 0)) for g in gt]

        gtm = np.zeros((T, len(gt)))
        dtm = np.zeros((T, len(dt)))
        gt_ig = np.array([g["_ignore"] for g in gt])
        dt_ig = np.zeros((T, len(dt)))
        for tind, t in enumerate(IOU_THRS):
            for dind, d in enumerate(dt):
                iou = min(t, 1 - 1e-10)
                m = -1
                for gind, g in enumerate(gt):
                    if gtm[tind, gind] > 0 and not iscrowd[gind]:
                        continue
                    if m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1:
                        break
                    cur = _iou_one(d["bbox"], g["bbox"], iscrowd[gind])
                    if cur < iou:
                        continue
                    iou = cur
                    m = gind
                if m == -1:
                    continue
                dt_ig[tind, dind] = gt_ig[m]
                dtm[tind, dind] = 1 + m
                gtm[tind, m] = 1 + dind
        # unmatched dets outside the area range are ignored
        a = np.array([
            d["bbox"][2] * d["bbox"][3] < a_rng[0]
            or d["bbox"][2] * d["bbox"][3] > a_rng[1]
            for d in dt
        ]).reshape(1, -1)
        dt_ig = np.logical_or(
            dt_ig, np.logical_and(dtm == 0, np.repeat(a, T, 0))
        )
        return {
            "dtScores": [d["score"] for d in dt],
            "dtMatches": dtm,
            "dtIgnore": dt_ig,
            "gtIgnore": gt_ig,
        }

    # evaluate at the maxDet cap; accumulate slices per maxDets entry
    eval_imgs = {
        (k, a, i): evaluate_img(img, cat, AREA_RANGES[AREA_KEYS[a]],
                                max_det_cap)
        for k, cat in enumerate(cat_ids)
        for a in range(A)
        for i, img in enumerate(img_ids)
    }

    precision = -np.ones((T, R, K, A, M))
    recall = -np.ones((T, K, A, M))
    for k in range(K):
        for a in range(A):
            for m, max_det in enumerate(MAX_DETS):
                es = [eval_imgs[(k, a, i)] for i in range(len(img_ids))]
                es = [e for e in es if e is not None]
                if not es:
                    continue
                scores = np.concatenate(
                    [np.asarray(e["dtScores"][:max_det]) for e in es]
                )
                inds = np.argsort(-scores, kind="mergesort")
                dtm = np.concatenate(
                    [e["dtMatches"][:, :max_det] for e in es], axis=1
                )[:, inds]
                dt_ig = np.concatenate(
                    [e["dtIgnore"][:, :max_det] for e in es], axis=1
                )[:, inds]
                gt_ig = np.concatenate([e["gtIgnore"] for e in es])
                npig = int(np.count_nonzero(gt_ig == 0))
                if npig == 0:
                    continue
                tps = np.logical_and(dtm, np.logical_not(dt_ig))
                fps = np.logical_and(
                    np.logical_not(dtm), np.logical_not(dt_ig)
                )
                tp_sum = np.cumsum(tps, axis=1).astype(float)
                fp_sum = np.cumsum(fps, axis=1).astype(float)
                for t in range(T):
                    tp, fp = tp_sum[t], fp_sum[t]
                    nd = len(tp)
                    rc = tp / npig
                    pr = tp / (fp + tp + np.spacing(1))
                    q = np.zeros((R,))
                    recall[t, k, a, m] = rc[-1] if nd else 0
                    pr = pr.tolist()
                    for i in range(nd - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    inds_r = np.searchsorted(rc, RECALL_THRS, side="left")
                    try:
                        for ri, pi in enumerate(inds_r):
                            q[ri] = pr[pi]
                    except IndexError:
                        pass
                    precision[t, :, k, a, m] = np.asarray(q)

    def summ(ap, iou_thr=None, area="all", max_det=100):
        aind = AREA_KEYS.index(area)
        mind = MAX_DETS.index(max_det)
        if ap:
            s = precision[:, :, :, aind, mind]
            if iou_thr is not None:
                s = s[np.where(np.isclose(IOU_THRS, iou_thr))[0]]
        else:
            s = recall[:, :, aind, mind]
            if iou_thr is not None:
                s = s[np.where(np.isclose(IOU_THRS, iou_thr))[0]]
        v = s[s > -1]
        return float(np.mean(v)) if v.size else -1.0

    return {
        "AP": summ(1), "AP50": summ(1, 0.5), "AP75": summ(1, 0.75),
        "APs": summ(1, area="small"), "APm": summ(1, area="medium"),
        "APl": summ(1, area="large"),
        "AR@1": summ(0, max_det=1), "AR@10": summ(0, max_det=10),
        "AR@100": summ(0, max_det=100),
        "ARs": summ(0, area="small"), "ARm": summ(0, area="medium"),
        "ARl": summ(0, area="large"),
    }


# -- fixture generation -------------------------------------------------------


def make_fixture(seed, n_images=35, n_cats=6, crowd_prob=0.15,
                 fp_per_img=4, quantize_scores=True):
    """Non-trivial COCO-style fixture: gts in all 3 area bins, crowd anns,
    segmentation-style areas (!= w*h), detections jittered around gts plus
    false positives, score ties via quantization."""
    rng = np.random.RandomState(seed)
    gt_anns, dt_anns = [], []
    img_ids = list(range(1, n_images + 1))
    cat_ids = list(range(1, n_cats + 1))
    for img in img_ids:
        n_gt = rng.randint(1, 9)
        for _ in range(n_gt):
            # sample sizes across all bins: small(<32²), medium, large(>96²)
            scale = rng.choice([12, 40, 150])
            w = float(rng.uniform(0.5, 1.8) * scale)
            h = float(rng.uniform(0.5, 1.8) * scale)
            x = float(rng.uniform(0, 600 - w))
            y = float(rng.uniform(0, 600 - h))
            crowd = int(rng.rand() < crowd_prob)
            gt_anns.append(dict(
                image_id=img, category_id=int(rng.choice(cat_ids)),
                bbox=[x, y, w, h],
                # segmentation areas are smaller than the box (~0.7-0.95)
                area=float(w * h * rng.uniform(0.7, 0.95)),
                iscrowd=crowd,
            ))
            # 0-3 detections near this gt with varying IoU quality
            for _ in range(rng.randint(0, 4)):
                jw = w * rng.uniform(0.6, 1.4)
                jh = h * rng.uniform(0.6, 1.4)
                jx = x + w * rng.uniform(-0.3, 0.3)
                jy = y + h * rng.uniform(-0.3, 0.3)
                score = float(rng.uniform(0.05, 1.0))
                if quantize_scores:
                    score = round(score, 2)  # deliberate ties
                dt_anns.append(dict(
                    image_id=img,
                    category_id=int(
                        rng.choice(cat_ids) if rng.rand() < 0.2
                        else gt_anns[-1]["category_id"]
                    ),
                    bbox=[float(jx), float(jy), float(jw), float(jh)],
                    score=score,
                ))
        for _ in range(fp_per_img):  # pure false positives
            w, h = float(rng.uniform(8, 200)), float(rng.uniform(8, 200))
            dt_anns.append(dict(
                image_id=img, category_id=int(rng.choice(cat_ids)),
                bbox=[float(rng.uniform(0, 400)), float(rng.uniform(0, 400)),
                      w, h],
                score=round(float(rng.uniform(0.05, 1.0)), 2),
            ))
    return gt_anns, dt_anns, img_ids, cat_ids


def to_by_img_cat(anns):
    by = {}
    for a in anns:
        rec = dict(a)
        by.setdefault((a["image_id"], a["category_id"]), []).append(rec)
    return by


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_coco_metrics_match_oracle(seed):
    gt_anns, dt_anns, img_ids, cat_ids = make_fixture(seed)
    assert len(dt_anns) >= 300, len(dt_anns)
    assert any(a["iscrowd"] for a in gt_anns)

    expected = oracle_cocoeval(gt_anns, dt_anns, img_ids, cat_ids)
    got = evaluate_coco_map(
        to_by_img_cat(gt_anns), to_by_img_cat(dt_anns), img_ids, cat_ids
    )
    for k, v in expected.items():
        assert got[k] == pytest.approx(v, abs=1e-9), (k, got[k], v)


def test_coco_metrics_python_fallback_matches_native():
    """The native batched matcher and the pure-python fallback must agree
    (when the native lib is absent both sides take the python path and this
    degenerates to determinism)."""
    from basedet_tpu.evaluators import coco_metrics as cm

    gt_anns, dt_anns, img_ids, cat_ids = make_fixture(3)
    gt_by, dt_by = to_by_img_cat(gt_anns), to_by_img_cat(dt_anns)
    got_default = evaluate_coco_map(gt_by, dt_by, img_ids, cat_ids)

    orig = cm._eval_areas_batched
    cm._eval_areas_batched = lambda *a, **k: None  # force python path
    try:
        got_python = evaluate_coco_map(gt_by, dt_by, img_ids, cat_ids)
    finally:
        cm._eval_areas_batched = orig
    assert got_default == got_python
