"""Separable-matmul RoIAlign: gather/scatter-free formulation for TPU.

Bilinear RoIAlign (mode="average", aligned=True, the MegEngine
``F.nn.roi_align`` semantics used by /root/reference/basedet/layers/common/
roi_pool.py:12-78) factorizes per RoI:

    pooled[i, j, c] = Σ_y Σ_x  Py[i, y] · Px[j, x] · F[y, x, c]

because every bilinear sample weight is a product of a y-term and an x-term,
and the in-bin S×S average distributes over the two axes.  ``Py`` is the
(ph, H_l) matrix that already folds: the S sample positions per bin, the
bilinear lerp against rows y_lo/y_lo+1 (with the hi=min(lo+1, H−1) edge
clamp), the out-of-range zeroing, the 1/S average, and the FPN
level-assignment mask (a RoI assigned to another level gets an all-zero Py,
so summing the per-level outputs reconstructs the multilevel result).

Why: on TPU, gather cost scales with row count and the backward scatter-add
serializes; the round-1 block-gather formulation spends ~38 ms/step in
Faster R-CNN training (playground/ablate_frcnn_ops.py).  Two dense matmuls
per (image, level) ride the MXU instead and the backward is just the
transposed matmuls — no scatter at all.  RoIs carry no gradient (proposals
are stop_gradient'ed in the reference and here), so only dF flows back,
which autodiff of the einsums produces natively.
"""
from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def _axis_weights(
    lo_coord: jnp.ndarray,  # (R,) roi start, feature coords (already −0.5)
    bin_size: jnp.ndarray,  # (R,)
    pool_dim: int,  # ph or pw
    sampling_ratio: int,
    size: int,  # H_l or W_l
    mask: jnp.ndarray,  # (R,) bool — level-assignment (and validity) mask
    dtype,
) -> jnp.ndarray:
    """Build the (R, pool_dim, size) separable weight tensor for one axis."""
    S = sampling_ratio
    f32 = jnp.float32
    steps = (
        jnp.arange(pool_dim, dtype=f32)[None, :, None]
        + (jnp.arange(S, dtype=f32)[None, None, :] + 0.5) / S
    )  # (1, P, S)
    coords = lo_coord[:, None, None].astype(f32) + steps * bin_size[
        :, None, None
    ].astype(f32)  # (R, P, S)

    oob = (coords < -1.0) | (coords > size)
    c = jnp.clip(coords, 0.0, size - 1.0)
    lo = jnp.floor(c)
    hi = jnp.minimum(lo + 1.0, size - 1.0)
    lerp = c - lo

    grid = jnp.arange(size, dtype=f32)  # (size,)
    w_sample = jnp.where(oob, 0.0, 1.0) / S
    # (R, P, S, size): (1−lerp)·δ(lo) + lerp·δ(hi); rows with lo==hi sum to 1
    w = (
        (grid == lo[..., None]) * (1.0 - lerp)[..., None]
        + (grid == hi[..., None]) * lerp[..., None]
    ) * w_sample[..., None]
    w = jnp.sum(w, axis=2)  # (R, P, size)
    return (w * mask[:, None, None]).astype(dtype)


def roi_level_assignment(
    rois: jnp.ndarray,  # (..., 4) xyxy
    min_level: int,
    max_level: int,
    canonical_level: int = 4,
    canonical_box_size: int = 224,
) -> jnp.ndarray:
    """log2 FPN level ids, 0-based from min_level (roi_pool.py:12-33)."""
    area = jnp.clip(rois[..., 2] - rois[..., 0], 0) * jnp.clip(
        rois[..., 3] - rois[..., 1], 0
    )
    lvl = jnp.floor(
        canonical_level
        + jnp.log(jnp.sqrt(jnp.maximum(area, 1e-12)) / canonical_box_size)
        / math.log(2.0)
    ).astype(jnp.int32)
    return jnp.clip(lvl, min_level, max_level) - min_level


def multilevel_roi_align_batched(
    features: List[jnp.ndarray],  # per level (B, H_l, W_l, C)
    rois: jnp.ndarray,  # (B, R, 4) xyxy image coords
    strides: Sequence[int],
    output_size: Tuple[int, int] = (7, 7),
    sampling_ratio: int = 2,
    aligned: bool = True,
    canonical_level: int = 4,
    canonical_box_size: int = 224,
) -> jnp.ndarray:
    """Batched multilevel RoIAlign via separable matmuls → (B, R, ph, pw, C).

    Numerically equivalent to ops/roi_align.multilevel_roi_align on the
    per-image roi layout (tests/ops/test_roi_align_separable.py); RoIs get
    zero cotangent (they are detached at every call site).
    """
    rois = jax.lax.stop_gradient(rois)
    ph, pw = output_size
    min_level = int(math.log2(strides[0]))
    max_level = int(math.log2(strides[-1]))
    lvl = roi_level_assignment(
        rois, min_level, max_level, canonical_level, canonical_box_size
    )  # (B, R)

    half = 0.5 if aligned else 0.0
    out = None
    for li, (feat, stride) in enumerate(zip(features, strides)):
        B, H, W, C = feat.shape
        scale = 1.0 / stride
        x1 = rois[..., 0] * scale - half  # (B, R)
        y1 = rois[..., 1] * scale - half
        x2 = rois[..., 2] * scale - half
        y2 = rois[..., 3] * scale - half
        roi_w, roi_h = x2 - x1, y2 - y1
        if not aligned:
            roi_w = jnp.maximum(roi_w, 1.0)
            roi_h = jnp.maximum(roi_h, 1.0)
        mask = lvl == li

        def one_image(f, yy1, bh, xx1, bw, m):
            py = _axis_weights(yy1, bh, ph, sampling_ratio, H, m, feat.dtype)
            px = _axis_weights(xx1, bw, pw, sampling_ratio, W, m, feat.dtype)
            # (R,ph,H) × (H,W,C) → (R,ph,W,C); then (R,pw,W) × … → (R,ph,pw,C)
            t = jnp.einsum(
                "piy,yxc->pixc", py, f, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return jnp.einsum(
                "pjx,pixc->pijc", px, t, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        o = jax.vmap(one_image)(
            feat, y1, roi_h / ph, x1, roi_w / pw, mask
        )  # (B, R, ph, pw, C) f32
        out = o if out is None else out + o
    return out.astype(features[0].dtype)
