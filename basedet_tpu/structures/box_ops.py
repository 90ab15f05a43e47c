"""Pure-functional box math on jnp arrays (xyxy unless stated otherwise).

Capability analogue of the reference's Boxes methods
(/root/reference/basedet/structures/boxes.py:10-219) and its fused
"op_patch" subgraph kernels (/root/reference/basedet/structures/op_patch.py:33-227:
box_iou / box_center / point_distance / box_ioa). Here the pairwise ops are
written as single fused jnp expressions — XLA fuses the elementwise graph into
one kernel on TPU (a tiled Pallas variant exists in
basedet_tpu/ops/iou_pallas.py; measured on-TPU 2026-08-18 via
playground/probe_iou_pallas.py it does not beat the XLA fusion at detection
problem sizes — jnp/pallas ms: 76725x100 0.499/0.549, 8400x100 0.298/0.320,
1000x1000 0.309/0.324; pallas only wins at large square shapes, 4096x4096
0.678/0.511 — so the jnp path is the production one).

All functions are shape-polymorphic over leading batch dims and jit-safe
(static shapes, no data-dependent control flow).
"""
from __future__ import annotations

import jax.numpy as jnp


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of (..., 4) xyxy boxes."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return w * h


def box_center(boxes: jnp.ndarray) -> jnp.ndarray:
    """Centers (..., 2) of xyxy boxes (op_patch.box_center analogue)."""
    return (boxes[..., :2] + boxes[..., 2:4]) * 0.5


def box_wh(boxes: jnp.ndarray) -> jnp.ndarray:
    return boxes[..., 2:4] - boxes[..., :2]


def pairwise_intersection(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise intersection areas: (..., M, 4) x (..., N, 4) -> (..., M, N)."""
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:4], boxes2[..., None, :, 2:4])
    wh = jnp.clip(rb - lt, 0.0)
    return wh[..., 0] * wh[..., 1]


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU (..., M, N) (op_patch.box_iou analogue)."""
    inter = pairwise_intersection(boxes1, boxes2)
    a1 = box_area(boxes1)
    a2 = box_area(boxes2)
    union = a1[..., :, None] + a2[..., None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def box_ioa(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise intersection-over-area-of-boxes2 (op_patch.box_ioa analogue)."""
    inter = pairwise_intersection(boxes1, boxes2)
    a2 = box_area(boxes2)[..., None, :]
    return jnp.where(a2 > 0, inter / jnp.maximum(a2, 1e-12), 0.0)


def box_giou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise generalized IoU (..., M, N) (Boxes.giou analogue,
    structures/boxes.py)."""
    inter = pairwise_intersection(boxes1, boxes2)
    a1 = box_area(boxes1)
    a2 = box_area(boxes2)
    union = a1[..., :, None] + a2[..., None, :] - inter
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)
    # smallest enclosing box
    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:4], boxes2[..., None, :, 2:4])
    wh = jnp.clip(rb - lt, 0.0)
    enclose = wh[..., 0] * wh[..., 1]
    return iou - jnp.where(
        enclose > 0, (enclose - union) / jnp.maximum(enclose, 1e-12), 0.0
    )


def elementwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IoU over matched (..., 4) box pairs."""
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:4], boxes2[..., 2:4])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(boxes1) + box_area(boxes2) - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def point_distance(points: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """Signed distances (l, t, r, b) of (..., M, 2) points to (..., N, 4) box
    edges -> (..., M, N, 4) (op_patch.point_distance analogue; positive
    everywhere iff the point lies inside the box)."""
    px = points[..., :, None, 0]
    py = points[..., :, None, 1]
    left = px - boxes[..., None, :, 0]
    top = py - boxes[..., None, :, 1]
    right = boxes[..., None, :, 2] - px
    bottom = boxes[..., None, :, 3] - py
    return jnp.stack([left, top, right, bottom], axis=-1)


def clip_boxes(boxes: jnp.ndarray, hw) -> jnp.ndarray:
    """Clip xyxy boxes to image bounds [0, w] x [0, h]; ``hw = (h, w)`` may be
    python scalars or traced values."""
    h, w = hw[0], hw[1]
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def scale_boxes(boxes: jnp.ndarray, scale_x, scale_y) -> jnp.ndarray:
    return boxes * jnp.stack(
        [
            jnp.asarray(scale_x, boxes.dtype),
            jnp.asarray(scale_y, boxes.dtype),
            jnp.asarray(scale_x, boxes.dtype),
            jnp.asarray(scale_y, boxes.dtype),
        ]
    )


def nonempty_mask(boxes: jnp.ndarray, threshold: float = 0.0) -> jnp.ndarray:
    """Mask of boxes with both sides > threshold (Boxes.filter_by_size
    analogue — returns a mask instead of filtering, for static shapes)."""
    wh = box_wh(boxes)
    return (wh[..., 0] > threshold) & (wh[..., 1] > threshold)
