"""RCNN box head: RoI sampling + 2-FC predictor (TPU-native).

Capability analogue of /root/reference/basedet/layers/head/rcnn.py:11-147.
Static-shape redesign of get_ground_truth (:95-147): proposals and padded
gt boxes concatenate to a fixed-length candidate set; fg/bg sampling uses
priority ranking (selected-fg > selected-bg > rest, random within tier) with
one static top-k compaction to exactly NUM_ROIS rows; unfilled rows carry
zero loss weight.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from basedet_tpu.layers.common.function import onehot_gather_rows
from basedet_tpu.layers.common.sampling import sample_mask
from basedet_tpu.layers.losses import smooth_l1_loss
from basedet_tpu.structures import BoxCoder, box_iou
from basedet_tpu.layers.precision import Dense


class RCNNPredictor(nn.Module):
    """Flatten → fc1(1024) → fc2(1024) → cls(C+1) / delta(C·4)
    (rcnn.py:32-50)."""

    num_classes: int

    @nn.compact
    def __call__(self, pooled: jnp.ndarray):
        """pooled: (R, ph, pw, C) → (logits (R, C+1), deltas (R, C, 4))."""
        x = pooled.reshape(pooled.shape[0], -1)
        x = jax.nn.relu(
            Dense(1024, kernel_init=nn.initializers.normal(0.01), name="fc1")(x)
        )
        x = jax.nn.relu(
            Dense(1024, kernel_init=nn.initializers.normal(0.01), name="fc2")(x)
        )
        logits = Dense(
            self.num_classes + 1, kernel_init=nn.initializers.normal(0.01),
            name="pred_cls",
        )(x)
        deltas = Dense(
            self.num_classes * 4, kernel_init=nn.initializers.normal(0.001),
            name="pred_delta",
        )(x)
        return logits, deltas.reshape(-1, self.num_classes, 4)


def rcnn_sample_single(
    rng: jax.Array,
    proposals: jnp.ndarray,     # (P, 4)
    proposal_valid: jnp.ndarray,  # (P,)
    gt: jnp.ndarray,            # (K, 5)
    num_valid,
    num_rois: int,
    fg_ratio: float,
    fg_thresh: float,
    bg_thresh_high: float,
    bg_thresh_low: float,
    box_coder: BoxCoder,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One image → (rois (NUM_ROIS, 4), labels (NUM_ROIS,),
    bbox_targets (NUM_ROIS, 4), weight (NUM_ROIS,))."""
    K = gt.shape[0]
    gt_valid = jnp.arange(K) < num_valid
    # candidate set: proposals + gt boxes (rcnn.py:104-111)
    all_rois = jnp.concatenate([proposals, gt[:, :4]], axis=0)  # (P+K, 4)
    roi_valid = jnp.concatenate([proposal_valid, gt_valid], axis=0)

    overlaps = box_iou(all_rois, gt[:, :4])  # (P+K, K)
    overlaps = jnp.where(gt_valid[None, :], overlaps, -1.0)
    max_ov = jnp.max(overlaps, axis=1)
    assignment = jnp.argmax(overlaps, axis=1)

    fg_mask = (max_ov >= fg_thresh) & roi_valid
    bg_mask = (max_ov >= bg_thresh_low) & (max_ov < bg_thresh_high) & roi_valid

    rng_fg, rng_bg, rng_tie = jax.random.split(rng, 3)
    num_fg = int(num_rois * fg_ratio)
    sel_fg = sample_mask(rng_fg, fg_mask, num_fg, cap=num_rois)
    num_bg = num_rois - jnp.sum(sel_fg)
    sel_bg = sample_mask(rng_bg, bg_mask, num_bg, cap=num_rois)

    # compact to exactly num_rois rows: fg tier > bg tier > rest
    noise = jax.random.uniform(rng_tie, (all_rois.shape[0],))
    priority = sel_fg * 2.0 + sel_bg * 1.0 + noise * 0.5
    _, order = jax.lax.top_k(priority, num_rois)

    # row lookups as one-hot MXU matmuls (dynamic-index gathers of ~1k tiny
    # rows serialize badly on TPU — same rework as the matched-GT lookups)
    picked = onehot_gather_rows(
        jnp.concatenate(
            [
                all_rois,
                onehot_gather_rows(gt, assignment),
                sel_fg[:, None].astype(jnp.float32),
                sel_bg[:, None].astype(jnp.float32),
            ],
            axis=1,
        ),
        order,
    )  # (num_rois, 4+5+1+1)
    rois = picked[:, :4]
    assigned_rows = picked[:, 4:9]
    chosen_fg = picked[:, 9] > 0.5
    chosen_bg = picked[:, 10] > 0.5
    labels = jnp.where(
        chosen_fg, assigned_rows[:, 4].astype(jnp.int32),
        jnp.where(chosen_bg, 0, -1),
    )
    targets = box_coder.encode(rois, assigned_rows[:, :4])
    targets = jnp.where(chosen_fg[:, None], targets, 0.0)
    weight = (chosen_fg | chosen_bg).astype(jnp.float32)
    return rois, labels, targets, weight


def rcnn_losses(
    logits: jnp.ndarray,       # (N, C+1)
    deltas: jnp.ndarray,       # (N, C, 4)
    labels: jnp.ndarray,       # (N,) -1 = padding
    targets: jnp.ndarray,      # (N, 4)
    weight: jnp.ndarray,       # (N,)
    smooth_l1_beta: float,
):
    num = jnp.maximum(jnp.sum(weight), 1.0)
    safe_labels = jnp.maximum(labels, 0)
    logits = logits.astype(jnp.float32)
    deltas = deltas.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, safe_labels[:, None], axis=1)[:, 0]
    cls_loss = jnp.sum(nll * weight) / num

    fg = labels > 0
    cls_idx = jnp.maximum(labels - 1, 0)
    fg_deltas = jnp.take_along_axis(
        deltas, cls_idx[:, None, None].repeat(4, axis=2), axis=1
    )[:, 0, :]
    reg_loss = jnp.sum(
        smooth_l1_loss(fg_deltas, targets, smooth_l1_beta) * fg[:, None]
    ) / num
    return cls_loss, reg_loss
