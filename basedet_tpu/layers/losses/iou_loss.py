"""IoU family losses over matched box pairs.

Capability analogue of /root/reference/basedet/layers/losses/iou_loss.py:9-105
with one deliberate redesign: the reference computes pairwise (M, N) IoU for
non-ltrb modes and callers take the diagonal (e.g. YOLOX's square-IoU "diag
trick", models/det/yolox.py:235) because MegEngine lacked a fused elementwise
IoU. Here the loss is elementwise over matched (..., 4) pairs — what every
call site actually wants — which avoids the O(M²) intermediate entirely.
"""
from __future__ import annotations

from typing import Tuple, Union

import jax.numpy as jnp

from basedet_tpu.structures.box_convert import convert_boxes
from basedet_tpu.structures.box_ops import elementwise_iou


def _ltrb_to_signed_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    """ltrb distances (l, t, r, b) → signed xyxy around the origin point."""
    return jnp.concatenate([-b[..., :2], b[..., 2:4]], axis=-1)


def pairwise_iou_ltrb(
    boxes1: jnp.ndarray,
    boxes2: jnp.ndarray,
    iou_type: str = "iou",
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Elementwise IoU/GIoU of matched ltrb-offset boxes (..., 4)
    (reference get_ltrb_boxes_iou, iou_loss.py:9-57)."""
    b1 = _ltrb_to_signed_xyxy(boxes1)
    b2 = _ltrb_to_signed_xyxy(boxes2)
    area1 = jnp.clip(b1[..., 2] - b1[..., 0], 0) * jnp.clip(b1[..., 3] - b1[..., 1], 0)
    area2 = jnp.clip(b2[..., 2] - b2[..., 0], 0) * jnp.clip(b2[..., 3] - b2[..., 1], 0)
    iw = jnp.clip(
        jnp.minimum(b1[..., 2], b2[..., 2]) - jnp.maximum(b1[..., 0], b2[..., 0]), 0
    )
    ih = jnp.clip(
        jnp.minimum(b1[..., 3], b2[..., 3]) - jnp.maximum(b1[..., 1], b2[..., 1]), 0
    )
    inter = iw * ih
    union = area1 + area2 - inter
    ious = inter / jnp.maximum(union, eps)
    if iou_type == "iou":
        return ious
    if iou_type == "giou":
        gw = jnp.maximum(b1[..., 2], b2[..., 2]) - jnp.minimum(b1[..., 0], b2[..., 0])
        gh = jnp.maximum(b1[..., 3], b2[..., 3]) - jnp.minimum(b1[..., 1], b2[..., 1])
        enclose = gw * gh
        return ious - (enclose - union) / jnp.maximum(enclose, eps)
    raise ValueError(f"iou_type {iou_type} not supported")


def iou_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    box_mode: str = "xyxy",
    loss_type: str = "iou",
    eps: float = 1e-8,
    return_iou: bool = False,
) -> Union[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Elementwise IoU loss over matched (..., 4) box pairs.

    loss_type: "iou" (-log iou), "linear_iou" (1-iou), "giou" (1-giou),
    "square_iou" (1-iou²). box_mode: "ltrb" | "xyxy" | "xywh" | "xcycwh".
    """
    assert loss_type in ("iou", "linear_iou", "giou", "square_iou")
    if box_mode == "ltrb":
        iou_type = "giou" if loss_type == "giou" else "iou"
        ious = pairwise_iou_ltrb(pred, target, iou_type=iou_type, eps=eps)
    else:
        p = convert_boxes(pred, box_mode, "xyxy")
        t = convert_boxes(target, box_mode, "xyxy")
        if loss_type == "giou":
            # elementwise giou
            inter_iou = elementwise_iou(p, t)
            lt = jnp.minimum(p[..., :2], t[..., :2])
            rb = jnp.maximum(p[..., 2:4], t[..., 2:4])
            wh = jnp.clip(rb - lt, 0)
            enclose = wh[..., 0] * wh[..., 1]
            area_p = jnp.clip(p[..., 2] - p[..., 0], 0) * jnp.clip(p[..., 3] - p[..., 1], 0)
            area_t = jnp.clip(t[..., 2] - t[..., 0], 0) * jnp.clip(t[..., 3] - t[..., 1], 0)
            iw = jnp.clip(jnp.minimum(p[..., 2], t[..., 2]) - jnp.maximum(p[..., 0], t[..., 0]), 0)
            ih = jnp.clip(jnp.minimum(p[..., 3], t[..., 3]) - jnp.maximum(p[..., 1], t[..., 1]), 0)
            union = area_p + area_t - iw * ih
            ious = inter_iou - (enclose - union) / jnp.maximum(enclose, eps)
        else:
            ious = elementwise_iou(p, t)

    if loss_type == "iou":
        loss = -jnp.log(jnp.maximum(ious, eps))
    elif loss_type == "square_iou":
        loss = 1.0 - ious ** 2
    else:
        loss = 1.0 - ious

    if return_iou:
        return loss, ious
    return loss
