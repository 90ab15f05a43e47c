"""OTA — optimal-transport label assignment (FCOS subclass, TPU-native).

Capability analogue of /root/reference/basedet/models/det/ota.py:16-268.
Static-shape redesign:
  * the per-image (K, R, C) focal-loss cost tensor (:121-135) collapses to a
    closed-form (K, R) expression — Σ_c FL(p_c, 0) − FL(p_y, 0) + FL(p_y, 1)
    — O(K·R) memory;
  * Sinkhorn matching is already fixed-iteration (TPU-friendly); the top-k
    variant uses rank-vs-k matching (layers/common/matcher.py);
  * the cross-rank num_fg all-reduce (:200) is the global-batch sum under
    pjit.
OTA reuses FCOS's inference path with the IoU branch in place of centerness.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from basedet_tpu.layers.common.function import (
    onehot_gather_rows,
    onehot_pick_per_column,
)
from basedet_tpu.layers.common.matcher import (
    SinkhornMatcher,
    topk_dynamic_k_matching,
)
from basedet_tpu.layers.losses import (
    binary_cross_entropy,
    iou_loss,
    sigmoid_focal_loss,
)
from basedet_tpu.utils import registers

from .fcos import FCOS
from .retinanet import _flatten_level


@registers.models.register()
class OTA(FCOS):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.matching = cfg.MODEL.get("MATCHING", "topk")
        self.reg_weight = cfg.MODEL.HEAD.get("COST_REG_WEIGHTS", 1.5)
        self.sinkhorn = SinkhornMatcher(eps=0.1, n_iters=50)

    def make_module(self, train: bool):
        import dataclasses

        module = super().make_module(train)
        # OTA head: ctrness branch acts as IoU prediction; decode mode by
        # NORM_REG_TARGETS (point_head.py:154-212)
        decode = (
            "relu_scale"
            if self.cfg.MODEL.HEAD.get("NORM_REG_TARGETS", True)
            else "exp_scale"
        )
        return dataclasses.replace(module, decode_mode=decode)

    # -- assignment ---------------------------------------------------------------
    def _ota_assign_single(
        self, points, strides_vec, gt, num_valid, pred_offsets, cls_logits
    ):
        """One image → (labels (R,), gt_deltas (R, 4), gt_ious (R,))."""
        K = gt.shape[0]
        R = points.shape[0]
        gt_valid = jnp.arange(K) < num_valid
        gt_xyxy = gt[:, :4]
        lcfg = self.cfg.MODEL.LOSSES
        alpha, gamma = lcfg.FOCAL_LOSS_ALPHA, lcfg.FOCAL_LOSS_GAMMA

        deltas = self.box_coder.encode(points[None, :, :], gt_xyxy[:, None, :])
        in_boxes = jnp.min(deltas, axis=-1) > 0.01

        radius = 2.5
        centers = (gt_xyxy[:, :2] + gt_xyxy[:, 2:4]) * 0.5
        r = strides_vec[None, :, None] * radius
        lo = jnp.maximum(centers[:, None, :] - r, gt_xyxy[:, None, :2])
        hi = jnp.minimum(centers[:, None, :] + r, gt_xyxy[:, None, 2:4])
        c_off = jnp.concatenate(
            [points[None, :, :] - lo, hi - points[None, :, :]], axis=-1
        )
        in_centers = jnp.min(c_off, axis=-1) > 0
        both = in_boxes & in_centers & gt_valid[:, None]

        # focal cost via the closed one-hot form
        p = jax.nn.sigmoid(cls_logits)  # (R, C)
        eps = 1e-12
        fl0 = -(1 - alpha) * (p ** gamma) * jnp.log(jnp.maximum(1 - p, eps))
        s0 = jnp.sum(fl0, axis=-1)  # (R,)
        labels0 = jnp.clip(gt[:, 4].astype(jnp.int32) - 1, 0, self.num_classes - 1)
        p_y = p[:, labels0].T  # (K, R)
        fl1_y = -alpha * ((1 - p_y) ** gamma) * jnp.log(jnp.maximum(p_y, eps))
        fl0_y = -(1 - alpha) * (p_y ** gamma) * jnp.log(jnp.maximum(1 - p_y, eps))
        loss_cls = s0[None, :] - fl0_y + fl1_y  # (K, R)
        loss_cls_bg = s0  # (R,)

        # iou cost between predicted ltrb offsets and per-gt target deltas
        loss_delta, ious = iou_loss(
            jnp.broadcast_to(pred_offsets[None], deltas.shape),
            deltas,
            box_mode="ltrb",
            loss_type="iou",
            return_iou=True,
        )
        cost = (
            loss_cls
            + self.reg_weight * loss_delta
            + 1e6 * (~both)
            + 1e9 * (~gt_valid)[:, None]
        )
        ious_masked = jnp.where(both, ious, 0.0)

        if self.matching == "sinkhorn":
            matched, fg_mask = self.sinkhorn(
                cost, loss_cls_bg, gt_valid, ious_masked
            )
        else:
            matched, fg_mask = topk_dynamic_k_matching(
                cost, ious_masked, gt_valid,
                candidate_topk=self.cfg.MODEL.HEAD.get("CANDIDATE_K", 10),
            )
            fg_mask &= jnp.any(both, axis=0)

        matched_gt = onehot_gather_rows(gt, matched)
        labels = jnp.where(fg_mask, matched_gt[:, 4].astype(jnp.int32), 0)
        gt_deltas = onehot_pick_per_column(deltas, matched)  # (R, 4)
        gt_deltas = jnp.where(fg_mask[:, None], gt_deltas, 0.0)
        gt_ious = onehot_pick_per_column(ious_masked, matched)  # (R,)
        gt_ious = jnp.where(fg_mask, gt_ious, 0.0)
        return labels, gt_deltas, gt_ious

    # -- losses ----------------------------------------------------------------------
    def get_losses(self, variables, batch, rng=None):
        inputs = self.pre_process(batch, train=True)
        module = self.make_module(train=True)
        mutable = [k for k in variables if k == "batch_stats"]
        if mutable:
            (logits_l, offsets_l, ious_l), new_state = module.apply(
                variables, inputs["image"], mutable=mutable
            )
        else:
            logits_l, offsets_l, ious_l = module.apply(variables, inputs["image"])
            new_state = {}

        feat_sizes = [tuple(x.shape[1:3]) for x in logits_l]
        points_list = self.point_gen(feat_sizes)
        points = jnp.concatenate(points_list, axis=0)
        import numpy as np

        strides_vec = jnp.asarray(
            np.concatenate(
                [
                    np.full((p.shape[0],), s, np.float32)
                    for p, s in zip(points_list, self.strides)
                ]
            )
        )

        C = self.num_classes
        logits = jnp.concatenate([_flatten_level(x, C) for x in logits_l], axis=1)
        offsets = jnp.concatenate([_flatten_level(x, 4) for x in offsets_l], axis=1)
        pred_ious = jnp.concatenate(
            [_flatten_level(x, 1) for x in ious_l], axis=1
        )[..., 0]

        gt_boxes = inputs["gt_boxes"]
        num_valid = inputs["img_info"][:, 4].astype(jnp.int32)
        labels, gt_deltas, gt_ious = jax.lax.stop_gradient(
            jax.vmap(
                functools.partial(self._ota_assign_single, points, strides_vec)
            )(gt_boxes, num_valid, offsets, logits)
        )

        fg = labels > 0
        num_fg = jnp.maximum(jnp.sum(fg), 1).astype(jnp.float32)
        lcfg = self.cfg.MODEL.LOSSES

        gt_targets = jax.nn.one_hot(
            jnp.where(fg, labels - 1, -1), C, dtype=logits.dtype
        )
        loss_cls = jnp.sum(
            sigmoid_focal_loss(
                logits, gt_targets,
                alpha=lcfg.FOCAL_LOSS_ALPHA, gamma=lcfg.FOCAL_LOSS_GAMMA,
            )
        ) / num_fg
        loss_reg = jnp.sum(
            iou_loss(offsets, gt_deltas, box_mode="ltrb",
                     loss_type=lcfg.IOU_LOSS_TYPE) * fg
        ) / num_fg * 2.0
        loss_ious = jnp.sum(
            binary_cross_entropy(pred_ious, gt_ious, with_logits=True) * fg
        ) / num_fg * 0.5

        total = loss_cls + loss_reg + loss_ious
        return total, {
            "total_loss": total,
            "loss_cls": loss_cls,
            "loss_offsets": loss_reg,
            "loss_ious": loss_ious,
        }, new_state
