"""RoIAlign for TPU — static-shape, single-gather multilevel design.

Capability analogue of MegEngine's native ``F.nn.roi_align`` (mode="average",
sample_points=2, aligned=True) and the FPN-level-assignment wrapper
``roi_pool`` (/root/reference/basedet/layers/common/roi_pool.py:12-78).

TPU-native re-design: instead of the reference's per-level ``cond_take`` +
concat + argsort re-ordering (dynamic shapes), all pyramid levels are
flattened into ONE (N, ΣHW, C) table and every RoI reads from it with a
single batched gather whose flat indices encode its assigned level. No
dynamic partitioning, no re-ordering, one XLA gather kernel.
"""
from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax.numpy as jnp


def roi_align(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    spatial_scale: float,
    output_size: Tuple[int, int],
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> jnp.ndarray:
    """Single-level RoIAlign.

    Args:
        features: (N, H, W, C).
        rois: (R, 5) rows of ``[batch_idx, x1, y1, x2, y2]`` in image coords.
    Returns:
        (R, ph, pw, C) average-pooled aligned features.
    """
    N, H, W, C = features.shape
    return _roi_align_levels(
        [features],
        rois,
        roi_scales=jnp.full((rois.shape[0],), spatial_scale, features.dtype),
        level_ids=jnp.zeros((rois.shape[0],), jnp.int32),
        output_size=output_size,
        sampling_ratio=sampling_ratio,
        aligned=aligned,
    )


def multilevel_roi_align(
    features: List[jnp.ndarray],
    rois: jnp.ndarray,
    strides: Sequence[int],
    output_size: Tuple[int, int] = (7, 7),
    sampling_ratio: int = 2,
    aligned: bool = True,
    canonical_level: int = 4,
    canonical_box_size: int = 224,
) -> jnp.ndarray:
    """FPN RoIAlign with log2 level assignment (roi_pool.py:12-33 semantics).

    features: list of (N, H_l, W_l, C), strides ascending (e.g. [4,8,16,32]).
    rois: (R, 5) [batch_idx, x1, y1, x2, y2]. Invalid rois (zero area) are
    safe — they produce zeros.
    """
    min_level = int(math.log2(strides[0]))
    max_level = int(math.log2(strides[-1]))
    area = jnp.clip(rois[:, 3] - rois[:, 1], 0) * jnp.clip(rois[:, 4] - rois[:, 2], 0)
    lvl = jnp.floor(
        canonical_level
        + jnp.log(jnp.sqrt(jnp.maximum(area, 1e-12)) / canonical_box_size)
        / math.log(2.0)
    ).astype(jnp.int32)
    lvl = jnp.clip(lvl, min_level, max_level) - min_level
    scales = jnp.asarray([1.0 / s for s in strides], features[0].dtype)
    return _roi_align_levels(
        features,
        rois,
        roi_scales=scales[lvl],
        level_ids=lvl,
        output_size=output_size,
        sampling_ratio=sampling_ratio,
        aligned=aligned,
    )


def _roi_align_levels(
    features: List[jnp.ndarray],
    rois: jnp.ndarray,
    roi_scales: jnp.ndarray,
    level_ids: jnp.ndarray,
    output_size: Tuple[int, int],
    sampling_ratio: int,
    aligned: bool,
) -> jnp.ndarray:
    N = features[0].shape[0]
    C = features[0].shape[-1]
    ph, pw = output_size
    S = sampling_ratio
    R = rois.shape[0]
    dtype = features[0].dtype

    # One flat (N * ΣHW, 4C) BLOCK table: row (n, y, x) holds the 2x2 pixel
    # block [(y,x), (y,x+1), (y+1,x), (y+1,x+1)] edge-clamp padded, so every
    # bilinear sample needs ONE gathered row instead of four. TPU gather
    # cost is dominated by row count, not bytes (measured: 803k C-rows
    # 12.7ms vs 201k 4C-rows 7.3ms), so this runs ~1.5x faster fwd and
    # shrinks the backward scatter row count 4x. Edge padding reproduces
    # _bilinear_params_dyn's hi=min(lo+1, size-1) clamp exactly.
    sizes = [(f.shape[1], f.shape[2]) for f in features]
    hw = [h * w for h, w in sizes]
    offsets = [0]
    for x in hw[:-1]:
        offsets.append(offsets[-1] + x)
    total = offsets[-1] + hw[-1]

    def block(f):
        fp = jnp.pad(f, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
        H, W = f.shape[1], f.shape[2]
        return jnp.concatenate(
            [
                fp[:, :H, :W],
                fp[:, :H, 1 : W + 1],
                fp[:, 1 : H + 1, :W],
                fp[:, 1 : H + 1, 1 : W + 1],
            ],
            axis=-1,
        )

    table = jnp.concatenate(
        [block(f).reshape(N, -1, 4 * C) for f in features], axis=1
    ).reshape(N * total, 4 * C)

    lvl_H = jnp.asarray([h for h, _ in sizes], jnp.int32)[level_ids]  # (R,)
    lvl_W = jnp.asarray([w for _, w in sizes], jnp.int32)[level_ids]
    lvl_off = jnp.asarray(offsets, jnp.int32)[level_ids]
    batch_idx = rois[:, 0].astype(jnp.int32)

    half = 0.5 if aligned else 0.0
    x1 = rois[:, 1] * roi_scales - half
    y1 = rois[:, 2] * roi_scales - half
    x2 = rois[:, 3] * roi_scales - half
    y2 = rois[:, 4] * roi_scales - half
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_w = roi_w / pw
    bin_h = roi_h / ph

    # sample coords: (R, ph|pw, S)
    iy = (jnp.arange(ph, dtype=dtype)[None, :, None]
          + (jnp.arange(S, dtype=dtype)[None, None, :] + 0.5) / S)
    ix = (jnp.arange(pw, dtype=dtype)[None, :, None]
          + (jnp.arange(S, dtype=dtype)[None, None, :] + 0.5) / S)
    ys = y1[:, None, None] + iy * bin_h[:, None, None]  # (R, ph, S)
    xs = x1[:, None, None] + ix * bin_w[:, None, None]  # (R, pw, S)

    y_lo, y_hi, ly, y_oob = _bilinear_params_dyn(ys, lvl_H[:, None, None])
    x_lo, x_hi, lx, x_oob = _bilinear_params_dyn(xs, lvl_W[:, None, None])

    base = (batch_idx * total + lvl_off)[:, None, None, None, None]  # (R,1,1,1,1)
    W_r = lvl_W[:, None, None, None, None]

    # ONE gathered block row per sample point, anchored at (y_lo, x_lo)
    flat = (
        base
        + y_lo[:, :, None, :, None] * W_r
        + x_lo[:, None, :, None, :]
    )  # (R, ph, pw, S, S)
    blocks = table[flat.reshape(-1)].reshape(R, ph, pw, S, S, 4, C)

    w_y = jnp.where(y_oob, 0.0, 1.0)
    w_x = jnp.where(x_oob, 0.0, 1.0)
    # weights: value = (1-ly)(1-lx) v00 + (1-ly)lx v01 + ly(1-lx) v10 + ly lx v11
    w00 = ((1 - ly) * w_y)[:, :, None, :, None] * ((1 - lx) * w_x)[:, None, :, None, :]
    w01 = ((1 - ly) * w_y)[:, :, None, :, None] * (lx * w_x)[:, None, :, None, :]
    w10 = (ly * w_y)[:, :, None, :, None] * ((1 - lx) * w_x)[:, None, :, None, :]
    w11 = (ly * w_y)[:, :, None, :, None] * (lx * w_x)[:, None, :, None, :]
    # (R, ph, pw, S, S, 4) — keep the gather/scatter path in the features'
    # (bf16) dtype: fp32 weights would promote it and double the HBM traffic
    # of the backward scatter-add, the dominant cost of two-stage training
    w = jnp.stack([w00, w01, w10, w11], axis=-1).astype(dtype)

    out = jnp.einsum("rijabk,rijabkc->rijc", w, blocks) / (S * S)
    return out  # (R, ph, pw, C)


def _bilinear_params_dyn(coord: jnp.ndarray, size: jnp.ndarray):
    """Like _bilinear_params but with per-element (traced) sizes."""
    sizef = size.astype(coord.dtype)
    out_of_range = (coord < -1.0) | (coord > sizef)
    c = jnp.clip(coord, 0.0, sizef - 1.0)
    low = jnp.floor(c)
    high = jnp.minimum(low + 1.0, sizef - 1.0)
    lerp = c - low
    return low.astype(jnp.int32), high.astype(jnp.int32), lerp, out_of_range
