"""ATSS — adaptive training sample selection (FCOS subclass).

Capability analogue of /root/reference/basedet/models/det/atss.py:11-86:
per-level top-k closest-center candidates; IoU threshold = mean + std of
candidate IoUs; argmax-IoU assignment gated by in-box. The reference's
``F.scatter``-built foreground mask becomes a vmapped ``.at[].set`` one-hot;
everything else is static broadcasting.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from basedet_tpu.layers.common.function import (
    extract_topk_mask,
    onehot_gather_rows,
)
from basedet_tpu.structures import box_iou
from basedet_tpu.utils import registers

from .fcos import FCOS


@registers.models.register()
class ATSS(FCOS):
    def _assign_batch(self, feat_sizes, gt_boxes, num_valid):
        points_list = self.point_gen(feat_sizes)
        scale = self.cfg.MODEL.ANCHOR.SCALE
        topk = self.cfg.MODEL.ANCHOR.TOPK

        # static per-level metadata
        pseudo_anchors = []   # (R_l, 4) per level
        for pts, stride in zip(points_list, self.strides):
            half = stride * scale / 2.0
            pseudo_anchors.append(
                jnp.concatenate([pts - half, pts + half], axis=1)
            )
        points = jnp.concatenate(points_list, axis=0)          # (R, 2)
        anchors = jnp.concatenate(pseudo_anchors, axis=0)       # (R, 4)

        def assign_one(gt, n):
            K = gt.shape[0]
            gt_valid = jnp.arange(K) < n
            gt_xyxy = gt[:, :4]
            centers = (gt_xyxy[:, :2] + gt_xyxy[:, 2:4]) * 0.5  # (K, 2)

            ious = box_iou(gt_xyxy, anchors)  # (K, R)

            # per-level closest-center top-k as iterative extraction masks
            # (no XLA TopK row sort, no index scatter — see extract_topk_mask)
            mask_list, n_cand = [], 0
            for pts in points_list:
                d = jnp.sqrt(
                    jnp.sum((centers[:, None, :] - pts[None, :, :]) ** 2, axis=2)
                )  # (K, R_l)
                k = min(topk, pts.shape[0])
                _, m = extract_topk_mask(-d, k)
                mask_list.append(m)
                n_cand += k
            is_candidate = jnp.concatenate(mask_list, axis=1)  # (K, R)

            # mean+std of the candidate ious via masked moments (population
            # std, matching jnp.std over the gathered candidates exactly —
            # every row has the same static candidate count n_cand)
            s1 = jnp.sum(jnp.where(is_candidate, ious, 0.0), axis=1, keepdims=True)
            s2 = jnp.sum(
                jnp.where(is_candidate, jnp.square(ious), 0.0), axis=1, keepdims=True
            )
            mean = s1 / n_cand
            thr = mean + jnp.sqrt(jnp.maximum(s2 / n_cand - jnp.square(mean), 0.0))
            is_fg = is_candidate & (ious >= thr)

            off = self.box_coder.encode(points[None, :, :], gt_xyxy[:, None, :])
            in_boxes = jnp.min(off, axis=2) > 0  # (K, R)

            masked = jnp.where(is_fg & in_boxes & gt_valid[:, None], ious, -1.0)
            match = jnp.argmax(masked, axis=0)
            max_iou = jnp.max(masked, axis=0)
            matched = onehot_gather_rows(gt, match)
            labels = jnp.where(
                max_iou <= -1.0, 0, matched[:, 4].astype(jnp.int32)
            )
            gt_offsets = self.box_coder.encode(points, matched[:, :4])
            lr = gt_offsets[:, jnp.asarray([0, 2])]
            tb = gt_offsets[:, jnp.asarray([1, 3])]
            ctr = jnp.sqrt(
                jnp.maximum(
                    jnp.min(lr, axis=1) / jnp.maximum(jnp.max(lr, axis=1), 1e-12), 0
                )
                * jnp.maximum(
                    jnp.min(tb, axis=1) / jnp.maximum(jnp.max(tb, axis=1), 1e-12), 0
                )
            )
            return labels, gt_offsets, ctr

        return jax.vmap(assign_one)(gt_boxes, num_valid)
