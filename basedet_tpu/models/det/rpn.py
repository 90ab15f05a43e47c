"""Region Proposal Network (TPU-native).

Capability analogue of /root/reference/basedet/models/det/rpn.py:17-240.
Static-shape redesign of find_top_rpn_proposals (:134-186): per-level
fixed-k top-k (padding levels smaller than k keep validity masks), level-wise
batched NMS with a FIXED post_nms_topk output slot count, undersized/clipped
proposals masked instead of filtered. Anchor sampling (:215-240) uses the
rank-vs-quota trick from layers/common/sampling.py.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from basedet_tpu.layers.common.function import onehot_gather_rows
from basedet_tpu.layers.common.matcher import Matcher
from basedet_tpu.layers.common.sampling import sample_mask
from basedet_tpu.layers.losses import binary_cross_entropy, smooth_l1_loss
from basedet_tpu.ops.nms import NEG_INF, batched_nms_padded
from basedet_tpu.structures import BoxCoder, box_iou
from basedet_tpu.structures.box_ops import clip_boxes, nonempty_mask
from basedet_tpu.layers.precision import Conv


class RPNHead(nn.Module):
    """Shared conv head over FPN levels (rpn.py:52-69)."""

    channels: int = 256
    num_cell_anchors: int = 3

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        winit = nn.initializers.normal(0.01)
        conv = Conv(self.channels, (3, 3), padding=1, kernel_init=winit,
                       name="rpn_conv")
        cls_score = Conv(self.num_cell_anchors, (1, 1), kernel_init=winit,
                            name="rpn_cls_score")
        bbox_pred = Conv(self.num_cell_anchors * 4, (1, 1),
                            kernel_init=winit, name="rpn_bbox_offsets")
        logits, offsets = [], []
        for f in features:
            t = jax.nn.relu(conv(f))
            logits.append(cls_score(t))     # (B, H, W, A)
            offsets.append(bbox_pred(t))    # (B, H, W, A*4)
        return logits, offsets


def find_top_proposals_single(
    logits_pl: List[jnp.ndarray],    # per level (R_l, 1) after flatten... (R_l,)
    offsets_pl: List[jnp.ndarray],   # per level (R_l, 4)
    anchors_list: List[jnp.ndarray],
    img_hw: Tuple,                   # traced (cur_h, cur_w)
    box_coder: BoxCoder,
    prev_nms_topk: int,
    post_nms_topk: int,
    nms_threshold: float,
    nms_backend=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One image → (proposals (P, 4), scores (P,), valid (P,)),
    P = post_nms_topk."""
    cand_boxes, cand_scores, cand_levels = [], [], []
    for level, (scores, offsets, anchors) in enumerate(
        zip(logits_pl, offsets_pl, anchors_list)
    ):
        k = min(prev_nms_topk, scores.shape[0])
        top_scores, idx = jax.lax.top_k(scores, k)
        props = box_coder.decode(anchors[idx], offsets[idx])
        props = clip_boxes(props, img_hw)
        ok = nonempty_mask(props)
        cand_boxes.append(props)
        cand_scores.append(jnp.where(ok, top_scores, NEG_INF))
        cand_levels.append(jnp.full((k,), level, jnp.int32))

    boxes = jnp.concatenate(cand_boxes, axis=0)
    scores = jnp.concatenate(cand_scores, axis=0)
    levels = jnp.concatenate(cand_levels, axis=0)
    _, out_boxes, out_scores, valid = batched_nms_padded(
        boxes, scores, levels, nms_threshold, post_nms_topk,
        backend=nms_backend,
    )
    return out_boxes, out_scores, valid


def rpn_ground_truth_single(
    rng: jax.Array,
    anchors: jnp.ndarray,            # (R, 4)
    gt: jnp.ndarray,                 # (K, 5)
    num_valid,
    matcher: Matcher,
    box_coder: BoxCoder,
    num_sample_anchors: int,
    num_pos_anchor: int,
):
    """(labels (R,), offsets (R, 4)) with sampling (rpn.py:215-240)."""
    K = gt.shape[0]
    gt_valid = jnp.arange(K) < num_valid
    overlaps = box_iou(gt[:, :4], anchors)
    match_idx, labels = matcher(overlaps, gt_valid)
    offsets = box_coder.encode(
        anchors, onehot_gather_rows(gt[:, :4], match_idx)
    )
    offsets = jnp.where((labels == 1)[:, None], offsets, 0.0)

    rng_pos, rng_neg = jax.random.split(rng)
    # keep at most num_pos_anchor positives
    pos_keep = sample_mask(rng_pos, labels == 1, num_pos_anchor,
                           cap=num_sample_anchors)
    labels = jnp.where((labels == 1) & ~pos_keep, -1, labels)
    # fill the rest with negatives
    num_neg = num_sample_anchors - jnp.sum(labels == 1)
    neg_keep = sample_mask(rng_neg, labels == 0, num_neg,
                           cap=num_sample_anchors)
    labels = jnp.where((labels == 0) & ~neg_keep, -1, labels)
    return labels, offsets


def rpn_losses(
    logits: jnp.ndarray,     # (B, R)
    offsets: jnp.ndarray,    # (B, R, 4)
    labels: jnp.ndarray,     # (B, R)
    gt_offsets: jnp.ndarray,  # (B, R, 4)
    smooth_l1_beta: float,
):
    valid = labels >= 0
    fg = labels > 0
    num_valid = jnp.maximum(jnp.sum(valid), 1).astype(jnp.float32)
    cls_loss = jnp.sum(
        binary_cross_entropy(logits, labels.astype(logits.dtype), with_logits=True)
        * valid
    ) / num_valid
    reg_loss = jnp.sum(
        smooth_l1_loss(offsets, gt_offsets, smooth_l1_beta) * fg[..., None]
    ) / num_valid
    return cls_loss, reg_loss
