"""FCOS — anchor-free one-stage detector (TPU-native).

Capability analogue of /root/reference/basedet/models/det/fcos.py:16-293.
Static-shape redesign:
  * GT assignment (size-of-interest gating + center sampling + min-area
    tie-break, :222-293) is one vmapped tensor program over the padded
    (B, K, 5) gt set — the per-image loop and the per-level center-sampling
    loop are both collapsed into broadcasting over a per-anchor stride
    vector;
  * the cross-rank all_reduce of num_fg/sum_ctr (:143-144) is implicit:
    under pjit the loss reduces over the GLOBAL batch, which is numerically
    identical to the reference's mean-allreduce + per-rank normalization.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from basedet_tpu.layers.backbone.fpn import FPN
from basedet_tpu.layers.common.anchor_generator import AnchorPointGenerator
from basedet_tpu.layers.common.post_processing import post_processing
from basedet_tpu.layers.common.function import onehot_gather_rows, topk_scores
from basedet_tpu.layers.head.point_head import PointHead
from basedet_tpu.layers.losses import (
    binary_cross_entropy,
    iou_loss,
    sigmoid_focal_loss,
)
from basedet_tpu.models.base_net import BaseNet
from basedet_tpu.layers.backbone.build import make_backbone
from basedet_tpu.ops.nms import NEG_INF
from basedet_tpu.structures import PointCoder
from basedet_tpu.utils import registers

from .retinanet import _flatten_level


class FCOSModule(nn.Module):
    backbone_name: str = "resnet50"
    backbone_norm: str = "FrozenBN"
    freeze_at: int = 2
    backbone_out_features: Sequence[str] = ("res3", "res4", "res5")
    fpn_strides: Sequence[int] = (8, 16, 32, 64, 128)
    fpn_out_channels: int = 256
    fpn_norm: str = None
    fpn_top_block_in_feature: str = "res5"
    num_classes: int = 80
    num_anchors: int = 1
    head_num_convs: int = 4
    prior_prob: float = 0.01
    with_norm: bool = True
    share_param: bool = True
    decode_mode: str = "relu_scale"
    train: bool = False

    @nn.compact
    def __call__(self, image: jnp.ndarray):
        import math

        bottom_up = make_backbone(
            self.backbone_name,
            norm=self.backbone_norm,
            freeze_at=self.freeze_at,
            out_features=tuple(self.backbone_out_features),
            train=self.train,
        )(image)
        feats = FPN(
            in_features=tuple(self.backbone_out_features),
            strides=tuple(self.fpn_strides[:3]),
            out_channels=self.fpn_out_channels,
            norm=self.fpn_norm,
            top_block="p6p7",
            top_block_in_feature=self.fpn_top_block_in_feature,
            train=self.train,
            name="fpn",
        )(bottom_up)
        level_names = [f"p{int(math.log2(s))}" for s in self.fpn_strides]
        features = [feats[n] for n in level_names]
        return PointHead(
            num_classes=self.num_classes,
            strides=tuple(self.fpn_strides),
            num_anchors=self.num_anchors,
            num_convs=self.head_num_convs,
            prior_prob=self.prior_prob,
            with_norm=self.with_norm,
            share_param=self.share_param,
            decode_mode=self.decode_mode,
            name="head",
        )(features)


@registers.models.register()
class FCOS(BaseNet):
    def __init__(self, cfg):
        super().__init__(cfg)
        m = cfg.MODEL
        self.point_gen = AnchorPointGenerator(
            strides=tuple(m.FPN.STRIDES), offset=m.ANCHOR.OFFSET
        )
        self.box_coder = PointCoder()
        self.strides = tuple(m.FPN.STRIDES)

    def make_module(self, train: bool) -> FCOSModule:
        m = self.cfg.MODEL
        return FCOSModule(
            backbone_name=m.BACKBONE.NAME,
            backbone_norm=m.BACKBONE.NORM,
            freeze_at=m.BACKBONE.FREEZE_AT,
            backbone_out_features=tuple(m.BACKBONE.OUT_FEATURES),
            fpn_strides=tuple(m.FPN.STRIDES),
            fpn_out_channels=m.FPN.OUT_CHANNELS,
            fpn_norm=m.FPN.NORM,
            fpn_top_block_in_feature=m.FPN.TOP_BLOCK_IN_FEATURE,
            num_classes=self.num_classes,
            num_anchors=m.ANCHOR.NUM_ANCHORS,
            head_num_convs=m.HEAD.NUM_CONVS,
            prior_prob=m.HEAD.CLS_PRIOR_PROB,
            with_norm=m.HEAD.get("WITH_NORM", True),
            share_param=m.HEAD.get("SHARE_PARAM", True),
            train=train,
        )

    # -- per-anchor static metadata ---------------------------------------------
    def _anchor_metadata(self, feat_sizes):
        """points (R, 2), per-anchor stride (R,), sizes-of-interest (R, 2)."""
        points_list = self.point_gen(feat_sizes)
        soi_cfg = self.cfg.MODEL.HEAD.OBJECT_SIZES_OF_INTEREST
        strides, soi = [], []
        for pts, s, (lo, hi) in zip(points_list, self.strides, soi_cfg):
            n = pts.shape[0]
            strides.append(np.full((n,), s, np.float32))
            hi = np.float32(1e8) if hi == float("inf") else np.float32(hi)
            soi.append(np.tile(np.asarray([lo, hi], np.float32), (n, 1)))
        return (
            jnp.concatenate(points_list, axis=0),
            jnp.asarray(np.concatenate(strides)),
            jnp.asarray(np.concatenate(soi, axis=0)),
        )

    def _assign_batch(self, feat_sizes, gt_boxes, num_valid):
        """vmapped per-image assignment; subclasses (ATSS) override."""
        points, strides, soi = self._anchor_metadata(feat_sizes)
        return jax.vmap(
            functools.partial(self._assign_single, points, strides, soi)
        )(gt_boxes, num_valid)

    def _assign_single(self, points, strides, soi, gt_boxes, num_valid):
        """FCOS GT assignment for one image (reference fcos.py:222-293)."""
        K = gt_boxes.shape[0]
        gt_valid = jnp.arange(K) < num_valid
        gt_xyxy = gt_boxes[:, :4]

        # ltrb offsets of every point vs every gt: (K, R, 4)
        offsets = self.box_coder.encode(points[None, :, :], gt_xyxy[:, None, :])
        max_off = jnp.max(offsets, axis=2)  # (K, R)
        cared = (max_off >= soi[None, :, 0]) & (max_off <= soi[None, :, 1])

        radius = self.cfg.MODEL.HEAD.CENTER_SAMPLING_RADIUS
        if radius > 0:
            centers = (gt_xyxy[:, :2] + gt_xyxy[:, 2:4]) * 0.5  # (K, 2)
            r = strides[None, :, None] * radius  # (1, R, 1)
            lo = jnp.maximum(centers[:, None, :] - r, gt_xyxy[:, None, :2])
            hi = jnp.minimum(centers[:, None, :] + r, gt_xyxy[:, None, 2:4])
            c_off = jnp.concatenate(
                [points[None, :, :] - lo, hi - points[None, :, :]], axis=-1
            )
            in_boxes = jnp.min(c_off, axis=2) > 0
        else:
            in_boxes = jnp.min(offsets, axis=2) > 0

        areas = (gt_xyxy[:, 2] - gt_xyxy[:, 0]) * (gt_xyxy[:, 3] - gt_xyxy[:, 1])
        areas = jnp.broadcast_to(areas[:, None], cared.shape)
        inf = jnp.float32(np.inf)
        areas = jnp.where(cared & in_boxes & gt_valid[:, None], areas, inf)

        match = jnp.argmin(areas, axis=0)  # (R,)
        min_area = jnp.min(areas, axis=0)
        matched = onehot_gather_rows(gt_boxes, match)  # (R, 5)
        labels = jnp.where(
            jnp.isinf(min_area), 0, matched[:, 4].astype(jnp.int32)
        )
        gt_offsets = self.box_coder.encode(points, matched[:, :4])

        lr = gt_offsets[:, jnp.asarray([0, 2])]
        tb = gt_offsets[:, jnp.asarray([1, 3])]
        ctr = jnp.sqrt(
            jnp.maximum(jnp.min(lr, axis=1) / jnp.maximum(jnp.max(lr, axis=1), 1e-12), 0)
            * jnp.maximum(jnp.min(tb, axis=1) / jnp.maximum(jnp.max(tb, axis=1), 1e-12), 0)
        )
        return labels, gt_offsets, ctr

    # -- train -------------------------------------------------------------------
    def get_losses(self, variables, batch, rng=None):
        inputs = self.pre_process(batch, train=True)
        module = self.make_module(train=True)
        mutable = [k for k in variables if k == "batch_stats"]
        if mutable:
            (logits_l, offsets_l, ctr_l), new_state = module.apply(
                variables, inputs["image"], mutable=mutable
            )
        else:
            logits_l, offsets_l, ctr_l = module.apply(variables, inputs["image"])
            new_state = {}

        feat_sizes = [tuple(x.shape[1:3]) for x in logits_l]

        logits = jnp.concatenate(
            [_flatten_level(x, self.num_classes) for x in logits_l], axis=1
        )
        offsets = jnp.concatenate([_flatten_level(x, 4) for x in offsets_l], axis=1)
        ctrness = jnp.concatenate([_flatten_level(x, 1) for x in ctr_l], axis=1)[..., 0]

        gt_boxes = inputs["gt_boxes"]
        num_valid = inputs["img_info"][:, 4].astype(jnp.int32)
        labels, gt_offsets, gt_ctr = self._assign_batch(
            feat_sizes, gt_boxes, num_valid
        )
        labels, gt_offsets, gt_ctr = jax.lax.stop_gradient(
            (labels, gt_offsets, gt_ctr)
        )

        valid = labels >= 0
        fg = labels > 0
        num_fg = jnp.maximum(jnp.sum(fg), 1).astype(jnp.float32)
        sum_ctr = jnp.maximum(jnp.sum(jnp.where(fg, gt_ctr, 0.0)), 1e-6)

        lcfg = self.cfg.MODEL.LOSSES
        gt_targets = jax.nn.one_hot(
            jnp.where(fg, labels - 1, -1), self.num_classes, dtype=logits.dtype
        )
        cls_loss = jnp.sum(
            sigmoid_focal_loss(
                logits, gt_targets,
                alpha=lcfg.FOCAL_LOSS_ALPHA, gamma=lcfg.FOCAL_LOSS_GAMMA,
            ) * valid[..., None]
        ) / num_fg
        reg_loss = jnp.sum(
            iou_loss(
                offsets, gt_offsets, box_mode="ltrb",
                loss_type=lcfg.IOU_LOSS_TYPE,
            ) * jnp.where(fg, gt_ctr, 0.0)
        ) / sum_ctr * lcfg.REG_LOSS_WEIGHT
        ctr_loss = jnp.sum(
            binary_cross_entropy(ctrness, gt_ctr, with_logits=True)
            * fg
        ) / num_fg

        total = cls_loss + reg_loss + ctr_loss
        return total, {
            "total_loss": total,
            "cls_loss": cls_loss,
            "reg_loss": reg_loss,
            "ctr_loss": ctr_loss,
        }, new_state

    # -- eval ---------------------------------------------------------------------
    def inference(self, variables, batch):
        inputs = self.pre_process(batch, train=False)
        module = self.make_module(train=False)
        logits_l, offsets_l, ctr_l = module.apply(variables, inputs["image"])

        feat_sizes = [tuple(x.shape[1:3]) for x in logits_l]
        points_list = self.point_gen(feat_sizes)
        test_cfg = self.cfg.TEST

        def single_image(logits_pl, offsets_pl, ctr_pl, img_info):
            cand_boxes, cand_scores, cand_labels = [], [], []
            for logits, offsets, ctr, points in zip(
                logits_pl, offsets_pl, ctr_pl, points_list
            ):
                C = self.num_classes
                score = jnp.sqrt(
                    jax.nn.sigmoid(logits) * jax.nn.sigmoid(ctr)
                ).reshape(-1)  # (R*C,)
                k = min(1000, score.shape[0])
                top_scores, top_idx = topk_scores(score, k)
                keep = top_scores > test_cfg.CLS_THRESHOLD
                pt_idx = top_idx // C
                cls_idx = top_idx % C
                boxes = self.box_coder.decode(points[pt_idx], offsets[pt_idx])
                cand_boxes.append(boxes)
                cand_scores.append(jnp.where(keep, top_scores, NEG_INF))
                cand_labels.append(cls_idx)
            return post_processing(
                jnp.concatenate(cand_boxes, axis=0),
                jnp.concatenate(cand_scores, axis=0),
                jnp.concatenate(cand_labels, axis=0),
                img_info,
                iou_threshold=test_cfg.IOU_THRESHOLD,
                max_detections=test_cfg.MAX_BOXES_PER_IMAGE,
            )

        logits_b = [_flatten_level(x, self.num_classes) for x in logits_l]
        offsets_b = [_flatten_level(x, 4) for x in offsets_l]
        ctr_b = [_flatten_level(x, 1) for x in ctr_l]
        boxes, scores, labels, valid = jax.vmap(single_image)(
            logits_b, offsets_b, ctr_b, inputs["img_info"]
        )
        return {
            "boxes": boxes,
            "box_scores": scores,
            "box_labels": labels,
            "valid": valid,
        }
