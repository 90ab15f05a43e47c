"""Anchor / point grid generators.

Capability analogue of /root/reference/basedet/layers/common/anchor_generator.py:52-182
(DefaultAnchorGenerator, AnchorPointGenerator, FastPointGenerator).

TPU-native: feature-map sizes are static under jit, so grids are generated in
numpy at trace time and embedded as constants — zero device work per step.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp


def _grid_centers(feat_size: Tuple[int, int], stride: int, offset: float):
    """(H*W,) x/y coordinates of cell centers, row-major (y outer, x inner)."""
    h, w = feat_size
    shift = offset * stride
    xs = shift + stride * np.arange(w, dtype=np.float32)
    ys = shift + stride * np.arange(h, dtype=np.float32)
    gx, gy = np.meshgrid(xs, ys)  # (h, w)
    return gx.reshape(-1), gy.reshape(-1)


@dataclass(frozen=True)
class DefaultAnchorGenerator:
    """Scale x ratio base anchors replicated over the stride grid.

    Matches reference semantics: base anchor of area scale² with aspect
    ``ratio`` = h/w, centered at (offset·stride) grid points; per-location
    anchor ordering is scale-major then ratio (anchor_generator.py:99-108);
    level output is (H·W·A, 4) with grid-major layout (:116-121).
    """

    anchor_scales: Sequence[Sequence[float]] = ((32,), (64,), (128,), (256,), (512,))
    anchor_ratios: Sequence[Sequence[float]] = ((0.5, 1, 2),)
    strides: Sequence[int] = (4, 8, 16, 32, 64)
    offset: float = 0.0

    @property
    def num_features(self) -> int:
        return len(self.strides)

    @property
    def num_anchors(self) -> int:
        scales = self._per_level(self.anchor_scales)
        ratios = self._per_level(self.anchor_ratios)
        return len(scales[0]) * len(ratios[0])

    def _per_level(self, vals):
        vals = [list(v) for v in vals]
        if len(vals) == 1:
            vals = vals * self.num_features
        assert len(vals) == self.num_features
        return vals

    def base_anchors(self) -> List[np.ndarray]:
        out = []
        for scales, ratios in zip(
            self._per_level(self.anchor_scales), self._per_level(self.anchor_ratios)
        ):
            anchors = []
            for s in scales:
                area = float(s) ** 2
                for r in ratios:
                    w = math.sqrt(area / r)
                    h = r * w
                    anchors.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
            out.append(np.asarray(anchors, np.float32))
        return out

    def __call__(self, feat_sizes: Sequence[Tuple[int, int]]) -> List[jnp.ndarray]:
        """feat_sizes: [(H, W), ...] per level → [(H·W·A, 4) xyxy anchors]."""
        assert len(feat_sizes) == self.num_features
        outs = []
        for size, stride, base in zip(feat_sizes, self.strides, self.base_anchors()):
            gx, gy = _grid_centers(size, stride, self.offset)
            grids = np.stack([gx, gy, gx, gy], axis=1)  # (HW, 4)
            anchors = (grids[:, None, :] + base[None, :, :]).reshape(-1, 4)
            outs.append(jnp.asarray(anchors))
        return outs


@dataclass(frozen=True)
class AnchorPointGenerator:
    """Anchor points for anchor-free heads (FCOS family).

    Matches reference AnchorPointGenerator (anchor_generator.py:125-165):
    per-level (H·W, 2) points at (offset·stride) grid centers."""

    strides: Sequence[int] = (8, 16, 32, 64, 128)
    offset: float = 0.5

    @property
    def num_features(self) -> int:
        return len(self.strides)

    def __call__(self, feat_sizes: Sequence[Tuple[int, int]]) -> List[jnp.ndarray]:
        outs = []
        for size, stride in zip(feat_sizes, self.strides):
            gx, gy = _grid_centers(size, stride, self.offset)
            outs.append(jnp.asarray(np.stack([gx, gy], axis=1)))
        return outs


@dataclass(frozen=True)
class FastPointGenerator:
    """YOLOX grid generator (anchor_generator.py:169-182): per-level
    (H·W, 2) anchor coords in IMAGE PIXELS (grid·stride, offset 0 → cell
    top-left corners) plus the matching per-anchor stride vector."""

    strides: Sequence[int] = (8, 16, 32)
    offset: float = 0.0

    def __call__(self, feat_sizes):
        grids, strides = [], []
        for size, stride in zip(feat_sizes, self.strides):
            gx, gy = _grid_centers(size, stride, self.offset)
            grids.append(jnp.asarray(np.stack([gx, gy], axis=1)))
            strides.append(
                jnp.full((size[0] * size[1],), float(stride), jnp.float32)
            )
        return grids, strides
