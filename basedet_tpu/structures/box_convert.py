"""Box mode conversions (xyxy / xywh / xcycwh).

Capability analogue of /root/reference/basedet/structures/box_convert.py:11-96
(BoxConverter / BoxMode with xywh as the pivot mode).
"""
from __future__ import annotations

import enum

import jax.numpy as jnp


class BoxMode(str, enum.Enum):
    XYXY = "xyxy"
    XYWH = "xywh"
    XCYCWH = "xcycwh"


def _to_xywh(boxes: jnp.ndarray, mode: BoxMode) -> jnp.ndarray:
    if mode == BoxMode.XYWH:
        return boxes
    if mode == BoxMode.XYXY:
        xy = boxes[..., :2]
        wh = boxes[..., 2:4] - boxes[..., :2]
        return jnp.concatenate([xy, wh], axis=-1)
    if mode == BoxMode.XCYCWH:
        wh = boxes[..., 2:4]
        xy = boxes[..., :2] - wh * 0.5
        return jnp.concatenate([xy, wh], axis=-1)
    raise ValueError(f"unknown mode {mode}")


def _from_xywh(boxes: jnp.ndarray, mode: BoxMode) -> jnp.ndarray:
    if mode == BoxMode.XYWH:
        return boxes
    if mode == BoxMode.XYXY:
        xy2 = boxes[..., :2] + boxes[..., 2:4]
        return jnp.concatenate([boxes[..., :2], xy2], axis=-1)
    if mode == BoxMode.XCYCWH:
        xc = boxes[..., :2] + boxes[..., 2:4] * 0.5
        return jnp.concatenate([xc, boxes[..., 2:4]], axis=-1)
    raise ValueError(f"unknown mode {mode}")


def convert_boxes(boxes: jnp.ndarray, src, dst) -> jnp.ndarray:
    """Convert (..., 4+) boxes between modes; extra trailing columns (labels,
    scores) are preserved untouched."""
    src = BoxMode(src)
    dst = BoxMode(dst)
    if src == dst:
        return boxes
    coords = boxes[..., :4]
    extra = boxes[..., 4:]
    out = _from_xywh(_to_xywh(coords, src), dst)
    if extra.shape[-1]:
        out = jnp.concatenate([out, extra], axis=-1)
    return out
