"""YOLOX SimOTA assignment vs a naive numpy reimplementation of the
reference algorithm (models/det/yolox.py:296-408 semantics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basedet_tpu.configs import YOLOXSConfig
from basedet_tpu.utils.dummy import DummyLoader


def naive_simota(anchors, strides, gt, num_valid, pred_xcycwh, cls_logits,
                 obj_logits, num_classes):
    """Sequential numpy SimOTA (reference semantics)."""
    def sigmoid(x):
        return 1 / (1 + np.exp(-x))

    K = num_valid
    gt = gt[:K]
    R = anchors.shape[0]
    gt_xyxy = gt[:, :4]

    ax, ay = anchors[:, 0], anchors[:, 1]
    in_boxes = np.stack([
        np.minimum.reduce([
            ax - g[0], ay - g[1], g[2] - ax, g[3] - ay
        ]) > 0 for g in gt_xyxy
    ])  # (K, R)
    centers = (gt_xyxy[:, :2] + gt_xyxy[:, 2:4]) / 2
    r = 2.5 * strides
    in_centers = np.stack([
        np.minimum.reduce([
            ax - (c[0] - r), ay - (c[1] - r), (c[0] + r) - ax, (c[1] + r) - ay
        ]) > 0 for c in centers
    ])
    candidate = in_boxes.any(0) | in_centers.any(0)
    both = in_boxes & in_centers

    # iou between gt and decoded preds
    px = pred_xcycwh
    p_xyxy = np.stack([
        px[:, 0] - px[:, 2] / 2, px[:, 1] - px[:, 3] / 2,
        px[:, 0] + px[:, 2] / 2, px[:, 1] + px[:, 3] / 2,
    ], 1)
    ious = np.zeros((K, R))
    for k in range(K):
        g = gt_xyxy[k]
        ix1 = np.maximum(g[0], p_xyxy[:, 0]); iy1 = np.maximum(g[1], p_xyxy[:, 1])
        ix2 = np.minimum(g[2], p_xyxy[:, 2]); iy2 = np.minimum(g[3], p_xyxy[:, 3])
        inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
        ga = (g[2] - g[0]) * (g[3] - g[1])
        pa = np.clip(p_xyxy[:, 2] - p_xyxy[:, 0], 0, None) * np.clip(
            p_xyxy[:, 3] - p_xyxy[:, 1], 0, None)
        ious[k] = inter / np.maximum(ga + pa - inter, 1e-12)
    ious = ious * candidate[None, :]

    p = np.sqrt(sigmoid(cls_logits) * sigmoid(obj_logits)[:, None])  # (R, C)
    eps = 1e-8
    cost = np.zeros((K, R))
    for k in range(K):
        y = int(gt[k, 4]) - 1
        onehot = np.zeros(num_classes); onehot[y] = 1
        pb = np.clip(p, eps, 1 - eps)
        bce = -(onehot[None] * np.log(pb) + (1 - onehot[None]) * np.log(1 - pb)).sum(1)
        cost[k] = bce + 3.0 * (-np.log(ious[k] + 1e-8)) + 1e5 * (~both[k])
    cost += 1e9 * (~candidate)[None, :]

    # dynamic-k matching
    k_cap = min(10, R)
    matching = np.zeros((K, R), bool)
    for k in range(K):
        dyn = max(1, min(int(np.sort(ious[k])[::-1][:k_cap].sum()), k_cap))
        pos = np.argsort(cost[k])[:dyn]
        matching[k, pos] = True
    conflict = matching.sum(0) > 1
    for col in np.where(conflict)[0]:
        best = np.argmin(np.where(matching[:, col], cost[:, col], np.inf))
        matching[:, col] = False
        matching[best, col] = True
    fg = matching.any(0) & candidate
    matched = np.argmax(matching, axis=0)
    return fg, matched


@pytest.fixture(scope="module")
def model():
    cfg = YOLOXSConfig()
    cfg.MODEL.DEPTH_FACTOR = 0.33
    cfg.MODEL.WIDTH_FACTOR = 0.25
    return cfg.build_model()


def test_assign_single_matches_naive(model):
    rng = np.random.RandomState(0)
    C = model.num_classes
    # tiny anchor set: 64x64 image → levels 8x8, 4x4, 2x2 → 84 anchors
    feat_sizes = [(8, 8), (4, 4), (2, 2)]
    grids, strides_l = model.point_gen(feat_sizes)
    anchors = np.concatenate([np.asarray(g) for g in grids])
    strides = np.concatenate([np.asarray(s) for s in strides_l])
    R = anchors.shape[0]

    K, n_valid = 6, 4
    gt = np.zeros((K, 5), np.float32)
    for k in range(n_valid):
        x1, y1 = rng.uniform(0, 40, 2)
        w, h = rng.uniform(10, 24, 2)
        gt[k] = [x1, y1, x1 + w, y1 + h, rng.randint(1, C + 1)]

    pred = np.zeros((R, 4), np.float32)
    pred[:, :2] = anchors + rng.uniform(-4, 4, (R, 2))
    pred[:, 2:] = rng.uniform(8, 30, (R, 2))
    cls_logits = rng.randn(R, C).astype(np.float32)
    obj_logits = rng.randn(R, 1).astype(np.float32)

    fg, matched, pred_iou = model._assign_single(
        jnp.asarray(anchors), jnp.asarray(strides), jnp.asarray(gt),
        jnp.int32(n_valid), jnp.asarray(pred), jnp.asarray(cls_logits),
        jnp.asarray(obj_logits),
    )
    fg, matched = np.asarray(fg), np.asarray(matched)

    exp_fg, exp_matched = naive_simota(
        anchors, strides, gt, n_valid, pred, cls_logits, obj_logits[:, 0], C
    )
    np.testing.assert_array_equal(fg, exp_fg)
    np.testing.assert_array_equal(matched[fg], exp_matched[fg])
