"""Detection post-processing with static shapes.

Capability analogue of /root/reference/basedet/layers/common/post_processing.py:17-103
(batched_nms → rescale to original image → clip). Outputs are fixed-size
(max_detections) arrays + a validity mask instead of dynamically-sized lists.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from basedet_tpu.ops.nms import batched_nms_padded
from basedet_tpu.structures.box_ops import clip_boxes


def post_processing(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    labels: jnp.ndarray,
    img_info: jnp.ndarray,
    iou_threshold: float = 0.5,
    max_detections: int = 100,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single-image post-process. Invalid candidates must carry
    scores <= NEG_INF.

    Args:
        boxes: (K, 4) xyxy in network-input coordinates.
        scores/labels: (K,).
        img_info: (5,) [cur_h, cur_w, orig_h, orig_w, num_inst].
    Returns:
        (boxes (D, 4) in original-image coords, scores (D,), labels (D,),
        valid (D,)) with D = max_detections.
    """
    idx, out_boxes, out_scores, valid = batched_nms_padded(
        boxes, scores, labels, iou_threshold, max_detections
    )
    kept_labels = jnp.where(valid, labels[idx], -1)

    scale_y = img_info[2] / img_info[0]
    scale_x = img_info[3] / img_info[1]
    scaled = out_boxes * jnp.stack([scale_x, scale_y, scale_x, scale_y])
    clipped = clip_boxes(scaled, (img_info[2], img_info[3]))
    out_scores = jnp.where(valid, out_scores, 0.0)
    return clipped, out_scores, kept_labels, valid
