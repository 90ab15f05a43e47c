"""Box/point delta coders as pure functions on jnp arrays.

Capability analogue of /root/reference/basedet/structures/boxcoder.py:30-141
(BoxCoder / SumBoxCoder / PointCoder). Shapes are fully broadcast-polymorphic:
anchors (..., 4), targets/deltas (..., 4) or (..., K*4) via the trailing-axis
reshape handled by the caller. All math in the anchors' dtype.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence, Tuple

import jax.numpy as jnp


def _to_cs(boxes: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """xyxy -> (w, h, cx, cy), each (...)."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    return w, h, cx, cy


@dataclass(frozen=True)
class BoxCoder:
    """Standard R-CNN (dx, dy, dw, dh) coder with mean/std whitening."""

    reg_mean: Sequence[float] = (0.0, 0.0, 0.0, 0.0)
    reg_std: Sequence[float] = (1.0, 1.0, 1.0, 1.0)

    def _mean_std(self, dtype):
        return (
            jnp.asarray(self.reg_mean, dtype),
            jnp.asarray(self.reg_std, dtype),
        )

    def encode(self, anchors: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
        aw, ah, acx, acy = _to_cs(anchors)
        gw, gh, gcx, gcy = _to_cs(gt)
        dx = (gcx - acx) / aw
        dy = (gcy - acy) / ah
        dw = jnp.log(gw / aw)
        dh = jnp.log(gh / ah)
        target = jnp.stack([dx, dy, dw, dh], axis=-1)
        mean, std = self._mean_std(target.dtype)
        return (target - mean) / std

    def decode(self, anchors: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
        """anchors (..., 4), deltas (..., 4) -> boxes (..., 4).

        For class-specific deltas (..., K, 4), broadcast anchors to
        (..., 1, 4) at the call site.
        """
        mean, std = self._mean_std(deltas.dtype)
        deltas = deltas * std + mean
        aw, ah, acx, acy = _to_cs(anchors)
        pcx = acx + deltas[..., 0] * aw
        pcy = acy + deltas[..., 1] * ah
        pw = aw * jnp.exp(deltas[..., 2])
        ph = ah * jnp.exp(deltas[..., 3])
        return jnp.stack(
            [pcx - 0.5 * pw, pcy - 0.5 * ph, pcx + 0.5 * pw, pcy + 0.5 * ph],
            axis=-1,
        )


@dataclass(frozen=True)
class SumBoxCoder:
    """Additive coder: target = gt - anchors (whitened)."""

    reg_mean: Sequence[float] = (0.0, 0.0, 0.0, 0.0)
    reg_std: Sequence[float] = (1.0, 1.0, 1.0, 1.0)

    def encode(self, anchors: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
        target = gt - anchors
        mean = jnp.asarray(self.reg_mean, target.dtype)
        std = jnp.asarray(self.reg_std, target.dtype)
        return (target - mean) / std

    def decode(self, anchors: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.asarray(self.reg_mean, deltas.dtype)
        std = jnp.asarray(self.reg_std, deltas.dtype)
        return anchors + (deltas * std + mean)


@dataclass(frozen=True)
class PointCoder:
    """FCOS-style ltrb offsets relative to points (..., 2)."""

    def encode(self, points: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
        return jnp.concatenate(
            [points - gt[..., :2], gt[..., 2:4] - points], axis=-1
        )

    def decode(self, points: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
        x1 = points[..., 0] - deltas[..., 0]
        y1 = points[..., 1] - deltas[..., 1]
        x2 = points[..., 0] + deltas[..., 2]
        y2 = points[..., 1] + deltas[..., 3]
        return jnp.stack([x1, y1, x2, y2], axis=-1)
