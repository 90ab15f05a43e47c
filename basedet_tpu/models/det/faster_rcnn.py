"""Faster R-CNN — two-stage detector (TPU-native).

Capability analogue of /root/reference/basedet/models/det/faster_rcnn.py:14-130
(+ rpn.py + layers/head/rcnn.py). The whole two-stage pipeline — RPN
proposals, RoI sampling, multilevel RoIAlign, box head, losses — runs inside
ONE flax module call with static shapes end to end: a fixed post-NMS
proposal budget per image, fixed NUM_ROIS sampled rois, and a single-gather
RoIAlign (basedet_tpu/ops/roi_align.py).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from basedet_tpu.layers.backbone.fpn import FPN
from basedet_tpu.layers.common.anchor_generator import DefaultAnchorGenerator
from basedet_tpu.layers.common.matcher import Matcher
from basedet_tpu.layers.common.post_processing import post_processing
from basedet_tpu.layers.common.function import topk_scores
from basedet_tpu.layers.head.rcnn import (
    RCNNPredictor,
    rcnn_losses,
    rcnn_sample_single,
)
from basedet_tpu.models.base_net import BaseNet
from basedet_tpu.layers.backbone.build import make_backbone
from basedet_tpu.ops.nms import NEG_INF
from basedet_tpu.ops.roi_align_pallas import pool_rois_multilevel
from basedet_tpu.structures import BoxCoder
from basedet_tpu.utils import registers

from .rpn import (
    RPNHead,
    find_top_proposals_single,
    rpn_ground_truth_single,
    rpn_losses,
)


class FasterRCNNModule(nn.Module):
    cfg: dict  # full DetectionConfig tree (flax stores dicts as FrozenDict)
    train: bool = False

    @nn.compact
    def __call__(self, image, im_info, gt_boxes=None):
        import math

        from flax.core import unfreeze

        from basedet_tpu.utils import ConfigDict

        cfg = ConfigDict(unfreeze(self.cfg))
        m = cfg.MODEL
        bottom_up = make_backbone(
            m.BACKBONE.NAME,
            norm=m.BACKBONE.NORM,
            freeze_at=m.BACKBONE.FREEZE_AT,
            out_features=tuple(m.BACKBONE.OUT_FEATURES),
            train=self.train,
        )(image)
        feats = FPN(
            in_features=tuple(m.BACKBONE.OUT_FEATURES),
            strides=tuple(m.FPN.STRIDES[: len(m.BACKBONE.OUT_FEATURES)]),
            out_channels=m.FPN.OUT_CHANNELS,
            norm=m.FPN.NORM,
            top_block="p6",
            train=self.train,
            name="fpn",
        )(bottom_up)
        level_names = [f"p{int(math.log2(s))}" for s in m.FPN.STRIDES]
        features = [feats[n] for n in level_names]

        anchor_gen = DefaultAnchorGenerator(
            anchor_scales=m.ANCHOR.SCALES,
            anchor_ratios=m.ANCHOR.RATIOS,
            strides=tuple(m.FPN.STRIDES),
            offset=m.ANCHOR.OFFSET,
        )
        anchors_list = anchor_gen([tuple(f.shape[1:3]) for f in features])
        rpn_coder = BoxCoder(tuple(m.RPN_BOX_REG.MEAN), tuple(m.RPN_BOX_REG.STD))
        rcnn_coder = BoxCoder(tuple(m.RCNN_BOX_REG.MEAN), tuple(m.RCNN_BOX_REG.STD))

        A = anchor_gen.num_anchors
        logits_l, offsets_l = RPNHead(
            channels=m.RPN.CHANNELS, num_cell_anchors=A, name="rpn"
        )(features)

        B = image.shape[0]
        # flatten per level: (B, H, W, A) -> (B, H*W*A); offsets likewise
        flat_logits = [x.reshape(B, -1) for x in logits_l]
        flat_offsets = [x.reshape(B, -1, 4) for x in offsets_l]

        prev_k = m.RPN.TRAIN_PREV_NMS_TOPK if self.train else m.RPN.TEST_PREV_NMS_TOPK
        post_k = m.RPN.TRAIN_POST_NMS_TOPK if self.train else m.RPN.TEST_POST_NMS_TOPK

        # stop gradients at the branch ENTRY (not on the outputs): proposals
        # are detached either way (reference rpn.py:168), but detaching the
        # inputs keeps the whole decode+topk+NMS out of the vjp trace, which
        # (a) skips linearizing it and (b) lets the in-train NMS use the
        # Pallas kernel (no JVP rule) instead of the XLA fixpoint path.
        proposals, prop_scores, prop_valid = jax.vmap(
            lambda lg, of, info: find_top_proposals_single(
                lg, of, anchors_list, (info[0], info[1]), rpn_coder,
                prev_k, post_k, m.RPN.NMS_THRESHOLD,
            )
        )(
            [jax.lax.stop_gradient(x) for x in flat_logits],
            [jax.lax.stop_gradient(x) for x in flat_offsets],
            im_info,
        )

        rcnn_cfg = m.RCNN
        pool_feats = [feats[n] for n in rcnn_cfg.IN_FEATURES]
        num_classes = cfg.DATA.NUM_CLASSES
        predictor = RCNNPredictor(num_classes=num_classes, name="rcnn")

        if self.train:
            rng = self.make_rng("sampling")
            num_gt = im_info[:, 4].astype(jnp.int32)

            # RPN ground truth + losses
            matcher = Matcher(
                tuple(m.MATCHER.THRESHOLDS),
                tuple(m.MATCHER.LABELS),
                m.MATCHER.ALLOW_LOW_QUALITY,
            )
            anchors = jnp.concatenate(anchors_list, axis=0)
            rngs = jax.random.split(jax.random.fold_in(rng, 0), B)
            rpn_labels, rpn_offsets = jax.vmap(
                lambda r, g, n: rpn_ground_truth_single(
                    r, anchors, g, n, matcher, rpn_coder,
                    m.RPN.NUM_SAMPLE_ANCHORS,
                    int(m.RPN.POSITIVE_ANCHOR_RATIO * m.RPN.NUM_SAMPLE_ANCHORS),
                )
            )(rngs, gt_boxes, num_gt)
            rpn_labels = jax.lax.stop_gradient(rpn_labels)
            rpn_offsets = jax.lax.stop_gradient(rpn_offsets)
            all_logits = jnp.concatenate(flat_logits, axis=1)
            all_offsets = jnp.concatenate(flat_offsets, axis=1)
            loss_rpn_cls, loss_rpn_bbox = rpn_losses(
                all_logits, all_offsets, rpn_labels, rpn_offsets,
                cfg.MODEL.LOSSES.RPN_SMOOTH_L1_BETA,
            )

            # RCNN sampling
            rngs2 = jax.random.split(jax.random.fold_in(rng, 1), B)
            rois, labels, targets, weights = jax.vmap(
                lambda r, p, pv, g, n: rcnn_sample_single(
                    r, p, pv, g, n,
                    rcnn_cfg.NUM_ROIS, rcnn_cfg.FG_RATIO,
                    rcnn_cfg.FG_THRESHOLD, rcnn_cfg.BG_THRESHOLD_HIGH,
                    rcnn_cfg.BG_THRESHOLD_LOW, rcnn_coder,
                )
            )(rngs2, proposals, prop_valid, gt_boxes, num_gt)
            rois, labels, targets, weights = jax.lax.stop_gradient(
                (rois, labels, targets, weights)
            )

            # batched separable RoIAlign (Pallas on TPU); flatten for the
            # per-roi predictor
            N = rcnn_cfg.NUM_ROIS
            pooled = pool_rois_multilevel(
                pool_feats, rois, tuple(rcnn_cfg.STRIDES),
                tuple(m.ROI_POOLER.SIZE),
            ).reshape(B * N, *m.ROI_POOLER.SIZE, -1)
            logits, deltas = predictor(pooled)
            loss_rcnn_cls, loss_rcnn_bbox = rcnn_losses(
                logits, deltas, labels.reshape(-1), targets.reshape(-1, 4),
                weights.reshape(-1), cfg.MODEL.LOSSES.RCNN_SMOOTH_L1_BETA,
            )
            total = loss_rpn_cls + loss_rpn_bbox + loss_rcnn_cls + loss_rcnn_bbox
            return {
                "total_loss": total,
                "rpn_cls_loss": loss_rpn_cls,
                "rpn_reg_loss": loss_rpn_bbox,
                "rcnn_cls_loss": loss_rcnn_cls,
                "rcnn_reg_loss": loss_rcnn_bbox,
            }
        else:
            P = proposals.shape[1]
            pooled = pool_rois_multilevel(
                pool_feats, proposals, tuple(rcnn_cfg.STRIDES),
                tuple(m.ROI_POOLER.SIZE),
            ).reshape(B * P, *m.ROI_POOLER.SIZE, -1)
            logits, deltas = predictor(pooled)
            logits = logits.astype(jnp.float32)
            deltas = deltas.astype(jnp.float32)
            scores = jax.nn.softmax(logits, axis=-1)[:, 1:]  # (B*P, C)
            boxes = rcnn_coder.decode(
                proposals.reshape(-1, 4)[:, None, :], deltas
            )  # (B*P, C, 4)
            return (
                boxes.reshape(B, P, num_classes, 4),
                scores.reshape(B, P, num_classes),
                prop_valid,
            )


@registers.models.register()
class FasterRCNN(BaseNet):
    def make_module(self, train: bool) -> FasterRCNNModule:
        return FasterRCNNModule(cfg=self.cfg, train=train)

    def init_variables(self, rng, image_size=(512, 512), batch_size: int = 1):
        module = self.make_module(train=False)
        dummy = jnp.zeros((batch_size, *image_size, 3), jnp.float32)
        info = jnp.asarray(
            [[image_size[0], image_size[1], image_size[0], image_size[1], 0]],
            jnp.float32,
        ).repeat(batch_size, axis=0)
        return jax.jit(module.init)(rng, dummy, info)

    def get_losses(self, variables, batch, rng=None):
        inputs = self.pre_process(batch, train=True)
        module = self.make_module(train=True)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        mutable = [k for k in variables if k == "batch_stats"]
        kwargs = dict(rngs={"sampling": rng})
        if mutable:
            losses, new_state = module.apply(
                variables, inputs["image"], inputs["img_info"],
                inputs["gt_boxes"], mutable=mutable, **kwargs,
            )
        else:
            losses = module.apply(
                variables, inputs["image"], inputs["img_info"],
                inputs["gt_boxes"], **kwargs,
            )
            new_state = {}
        return losses["total_loss"], losses, new_state

    def inference(self, variables, batch):
        inputs = self.pre_process(batch, train=False)
        module = self.make_module(train=False)
        boxes, scores, prop_valid = module.apply(
            variables, inputs["image"], inputs["img_info"]
        )
        test_cfg = self.cfg.TEST
        C = self.num_classes

        def single_image(boxes_i, scores_i, valid_i, img_info):
            # (P, C, 4) / (P, C): flatten, threshold, pre-cut, NMS
            flat_scores = jnp.where(
                valid_i[:, None], scores_i, 0.0
            ).reshape(-1)  # (P*C,)
            k = min(2000, flat_scores.shape[0])
            top_scores, top_idx = topk_scores(flat_scores, k)
            keep = top_scores > test_cfg.get("CLS_THRESHOLD", 0.05)
            cls_idx = top_idx % C
            box_sel = boxes_i.reshape(-1, 4)[top_idx]
            return post_processing(
                box_sel,
                jnp.where(keep, top_scores, NEG_INF),
                cls_idx,
                img_info,
                iou_threshold=test_cfg.IOU_THRESHOLD,
                max_detections=test_cfg.MAX_BOXES_PER_IMAGE,
            )

        b, s, l, v = jax.vmap(single_image)(
            boxes, scores, prop_valid, inputs["img_info"]
        )
        return {"boxes": b, "box_scores": s, "box_labels": l, "valid": v}
