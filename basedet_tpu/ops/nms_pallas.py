"""Pallas TPU kernel for the NMS suppression loop.

The XLA formulation in ops/nms.py re-reads the full box set from HBM every
tile iteration and round-trips the keep vector through HBM between loop
steps. This kernel keeps the (coordinate-major) boxes AND the keep vector
resident in VMEM across the whole sequential tile grid — one HBM read of the
boxes total — and runs the same algorithm: per score-sorted tile, suppress by
earlier kept boxes, then resolve within-tile order with a Jacobi fixpoint
(any fixpoint of keep[i] = ¬∃j<i: keep[j] ∧ iou>t is the greedy-NMS result).

Layout: boxes are passed as (4, Kp) so the box axis rides the 128-wide lane
dimension (same trick as ops/iou_pallas.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 256


def _nms_kernel(boxes_ref, valid_ref, thresh_ref, keep_ref):
    """Grid: (n_tiles,) sequential. boxes_ref (4, Kp) VMEM; valid_ref
    (1, Kp) int32; thresh_ref (1, 1) SMEM; keep_ref (1, Kp) int32 out
    (also serves as the carried state across grid steps)."""
    i = pl.program_id(0)
    Kp = boxes_ref.shape[1]
    T = _TILE
    start = i * T
    thresh = thresh_ref[0, 0]

    @pl.when(i == 0)
    def _init():
        keep_ref[:, :] = valid_ref[:, :]

    # tile coordinates (T, 1)
    x1t = boxes_ref[0, pl.ds(start, T)][:, None]
    y1t = boxes_ref[1, pl.ds(start, T)][:, None]
    x2t = boxes_ref[2, pl.ds(start, T)][:, None]
    y2t = boxes_ref[3, pl.ds(start, T)][:, None]
    # all coordinates (1, Kp)
    x1a = boxes_ref[0, :][None, :]
    y1a = boxes_ref[1, :][None, :]
    x2a = boxes_ref[2, :][None, :]
    y2a = boxes_ref[3, :][None, :]

    iw = jnp.maximum(jnp.minimum(x2t, x2a) - jnp.maximum(x1t, x1a), 0.0)
    ih = jnp.maximum(jnp.minimum(y2t, y2a) - jnp.maximum(y1t, y1a), 0.0)
    inter = iw * ih
    area_t = (x2t - x1t) * (y2t - y1t)
    area_a = (x2a - x1a) * (y2a - y1a)
    union = area_t + area_a - inter
    overlap = inter > thresh * jnp.maximum(union, 1e-12)  # (T, Kp) iou>thresh

    col = jax.lax.broadcasted_iota(jnp.int32, (T, Kp), 1)
    keep_all = keep_ref[0, :][None, :] > 0  # (1, Kp)
    cross_sup = jnp.any(overlap & (col < start) & keep_all, axis=1)  # (T,)

    tile_valid = valid_ref[0, pl.ds(start, T)] > 0
    keep0 = tile_valid & ~cross_sup  # (T,)

    # within-tile overlap block recomputed tile-vs-tile (Pallas TPU has no
    # dynamic_slice on values), masked to the strict lower triangle
    x1r = boxes_ref[0, pl.ds(start, T)][None, :]
    y1r = boxes_ref[1, pl.ds(start, T)][None, :]
    x2r = boxes_ref[2, pl.ds(start, T)][None, :]
    y2r = boxes_ref[3, pl.ds(start, T)][None, :]
    iw_t = jnp.maximum(jnp.minimum(x2t, x2r) - jnp.maximum(x1t, x1r), 0.0)
    ih_t = jnp.maximum(jnp.minimum(y2t, y2r) - jnp.maximum(y1t, y1r), 0.0)
    inter_t = iw_t * ih_t
    area_r = (x2r - x1r) * (y2r - y1r)
    union_t = area_t + area_r - inter_t
    row = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    colt = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    ov_tile = (inter_t > thresh * jnp.maximum(union_t, 1e-12)) & (row > colt)

    # Jacobi fixpoint with int32 2-D carries (Mosaic-legal types); a while
    # with bool/1-D carries fails to legalize. Iteration k finalizes every
    # box whose suppression-chain depth ≤ k; T iterations are exact.
    ov_i = ov_tile.astype(jnp.int32)  # (T, T)
    keep0_i = keep0.astype(jnp.int32)[None, :]  # (1, T)

    def cond(state):
        cur, prev, it = state
        return jnp.logical_and(jnp.any(cur != prev), it < T)

    def body(state):
        cur, _, it = state
        sup = jnp.max(ov_i * cur, axis=1)[None, :]  # (1, T) any kept overlap
        new = keep0_i * (1 - sup)
        return new, cur, it + 1

    first = body((keep0_i, keep0_i, jnp.int32(0)))[0]
    final, _, _ = jax.lax.while_loop(
        cond, body, (first, keep0_i, jnp.int32(0))
    )
    keep_ref[0, pl.ds(start, T)] = final[0]


def nms_keep_pallas(sorted_boxes, valid, iou_threshold, interpret=False):
    """Greedy-NMS keep mask over score-sorted boxes.

    sorted_boxes (K, 4) xyxy, valid (K,) bool → keep (K,) bool.

    Differentiable call sites are allowed: the keep mask is piecewise
    constant in the box coordinates, so the VJP is zero (pallas_call itself
    has no autodiff rule — the custom_vjp wrapper supplies the trivial one).
    """
    if interpret:
        return _nms_keep_impl(sorted_boxes, valid, iou_threshold, True)
    return _nms_core(
        sorted_boxes,
        valid.astype(jnp.float32),
        jnp.asarray(iou_threshold, jnp.float32),
    )


@jax.custom_vjp
def _nms_core(sorted_boxes, valid_f, thresh):
    return _nms_keep_impl(sorted_boxes, valid_f > 0, thresh, False)


def _nms_core_fwd(sorted_boxes, valid_f, thresh):
    return _nms_core(sorted_boxes, valid_f, thresh), (
        sorted_boxes, valid_f, thresh,
    )


def _nms_core_bwd(residuals, _cotangent):
    sb, vf, t = residuals
    return jnp.zeros_like(sb), jnp.zeros_like(vf), jnp.zeros_like(t)


_nms_core.defvjp(_nms_core_fwd, _nms_core_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _nms_keep_impl(
    sorted_boxes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold,
    interpret: bool = False,
) -> jnp.ndarray:
    K = sorted_boxes.shape[0]
    Kp = max(_TILE, (K + _TILE - 1) // _TILE * _TILE)
    b = jnp.zeros((4, Kp), jnp.float32).at[:, :K].set(
        sorted_boxes.T.astype(jnp.float32)
    )
    v = jnp.zeros((1, Kp), jnp.int32).at[0, :K].set(valid.astype(jnp.int32))
    thresh = jnp.asarray([[iou_threshold]], jnp.float32)

    keep = pl.pallas_call(
        _nms_kernel,
        grid=(Kp // _TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Kp), jnp.int32),
        interpret=interpret,
    )(b, v, thresh)
    return keep[0, :K] > 0
