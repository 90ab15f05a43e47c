"""Static-shape non-maximum suppression for TPU.

Capability analogue of MegEngine's native CUDA ``F.vision.nms`` and the
class-offset ``batched_nms`` wrapper
(/root/reference/basedet/layers/common/post_processing.py:17-47), with the
reference's ``py_cpu_nms`` (:106-132) as the numerical oracle for tests.

TPU-native design: no dynamic output shapes. ``nms_padded`` takes a fixed-size
padded candidate set (invalid entries carry score=-inf) and returns a fixed
``max_output``-slot index array plus a validity mask. Suppression runs as a
tiled fixpoint iteration — within a score-sorted tile the Jacobi iteration of
``keep[i] = ~OR_{j<i}(iou[i,j] > t & keep[j])`` converges to the unique
greedy-NMS solution (any fixpoint of the recurrence equals the sequential
result); across tiles suppression is a parallel masked reduction against
already-finalized earlier tiles. All shapes static ⇒ one XLA compilation.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from basedet_tpu.structures.box_ops import box_iou

NEG_INF = -1e10


def _suppress_tile_fixpoint(iou_tile: jnp.ndarray, keep: jnp.ndarray) -> jnp.ndarray:
    """Resolve within-tile suppression.

    iou_tile: (T, T) IoU>threshold mask restricted to j < i (strict lower
    triangle). keep: (T,) initial validity. Returns final keep of the greedy
    sequential NMS restricted to this tile.
    """
    T = keep.shape[0]

    def cond(state):
        keep_cur, keep_prev, it = state
        return jnp.logical_and(jnp.any(keep_cur != keep_prev), it < T)

    def body(state):
        keep_cur, _, it = state
        suppressed = jnp.any(iou_tile & keep_cur[None, :], axis=1)
        keep_new = keep & ~suppressed
        return keep_new, keep_cur, it + 1

    # one Jacobi step then iterate to fixpoint
    first = keep & ~jnp.any(iou_tile & keep[None, :], axis=1)
    keep_final, _, _ = jax.lax.while_loop(cond, body, (first, keep, jnp.int32(0)))
    return keep_final


@functools.partial(jax.jit, static_argnames=("tile",))
def _nms_sorted(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold,
    tile: int,
) -> jnp.ndarray:
    """Greedy NMS over boxes already sorted by descending score.

    Returns keep mask (K,). ``valid`` marks real (non-padding) candidates.
    """
    K = boxes.shape[0]
    pad = (-K) % tile
    if pad:
        boxes = jnp.concatenate([boxes, jnp.zeros((pad, 4), boxes.dtype)], axis=0)
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)], axis=0)
    Kp = boxes.shape[0]
    n_tiles = Kp // tile

    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
        > jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
    )

    def tile_body(t, keep):
        start = t * tile
        tile_boxes = jax.lax.dynamic_slice(boxes, (start, 0), (tile, 4))
        # cross-tile: suppression by kept boxes strictly before this tile
        iou_all = box_iou(tile_boxes, boxes) > iou_threshold  # (tile, Kp)
        col = jax.lax.broadcasted_iota(jnp.int32, (tile, Kp), 1)
        before = col < start
        cross_sup = jnp.any(iou_all & before & keep[None, :], axis=1)
        tile_keep = (
            jax.lax.dynamic_slice(valid, (start,), (tile,)) & ~cross_sup
        )
        # within-tile fixpoint
        iou_tile = jax.lax.dynamic_slice(iou_all, (0, start), (tile, tile)) & tri
        tile_keep = _suppress_tile_fixpoint(iou_tile, tile_keep)
        return jax.lax.dynamic_update_slice(keep, tile_keep, (start,))

    keep = jax.lax.fori_loop(0, n_tiles, tile_body, valid)
    return keep[:K]


def nms_padded(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_output: int,
    score_threshold: Optional[float] = None,
    tile: int = 256,
    backend: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy hard NMS with static shapes.

    Args:
        boxes: (K, 4) xyxy. Padding rows allowed.
        scores: (K,). Padding entries must be ``<= NEG_INF`` (or below
            ``score_threshold``).
    Returns:
        (indices (max_output,) into the input arrays — score-descending,
         kept_boxes (max_output, 4), kept_scores (max_output,),
         valid mask (max_output,) bool).
    """
    K = boxes.shape[0]
    valid = scores > (NEG_INF / 2 if score_threshold is None else score_threshold)

    # sort all candidates by score (descending)
    sort_scores, order = jax.lax.top_k(jnp.where(valid, scores, NEG_INF), K)
    sort_boxes = boxes[order]
    sort_valid = sort_scores > NEG_INF / 2

    import os

    # the Pallas kernel has no JVP rule — differentiated call sites (e.g.
    # RPN proposals inside the train graph) must pass backend="xla"
    if backend is None:
        backend = os.environ.get("BASEDET_NMS_BACKEND")
    if backend is None:
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        from basedet_tpu.ops.nms_pallas import nms_keep_pallas

        keep = nms_keep_pallas(sort_boxes, sort_valid, iou_threshold)
    else:
        keep = _nms_sorted(sort_boxes, sort_valid, iou_threshold, tile)

    # compact kept entries (already score-sorted) into max_output slots
    kept_rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    out_slot = jnp.where(keep, kept_rank, max_output)  # overflow → dropped
    slot_ids = jnp.arange(max_output)
    # scatter: out[slot] = position; use argmax trick over one-hot
    onehot = (out_slot[:, None] == slot_ids[None, :])  # (K, max_output)
    any_fill = jnp.any(onehot, axis=0)
    src_pos = jnp.argmax(onehot, axis=0)  # first (only) match per slot
    out_idx = jnp.where(any_fill, order[src_pos], -1)
    out_boxes = jnp.where(any_fill[:, None], sort_boxes[src_pos], 0.0)
    out_scores = jnp.where(any_fill, sort_scores[src_pos], NEG_INF)
    return out_idx, out_boxes, out_scores, any_fill


def batched_nms_padded(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    idxs: jnp.ndarray,
    iou_threshold: float,
    max_output: int,
    tile: int = 256,
    backend: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Class-aware NMS via the coordinate-offset trick
    (reference post_processing.py:17-47). ``idxs`` is the per-box class id.

    Invalid candidates must carry ``scores <= NEG_INF``.
    Returns (indices, boxes_without_offset, scores, valid).
    """
    valid = scores > NEG_INF / 2
    # offset must be data-independent of invalid boxes: mask them to 0 first
    safe_boxes = jnp.where(valid[:, None], boxes, 0.0)
    max_coord = jnp.max(safe_boxes) + 1.0
    offsets = idxs.astype(boxes.dtype) * max_coord
    shifted = safe_boxes + offsets[:, None]
    idx, _, out_scores, out_valid = nms_padded(
        shifted, scores, iou_threshold, max_output, tile=tile, backend=backend
    )
    out_boxes = jnp.where(out_valid[:, None], safe_boxes[idx], 0.0)
    return idx, out_boxes, out_scores, out_valid
