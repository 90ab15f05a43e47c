"""RetinaNet — anchor-based one-stage detector (TPU-native).

Capability analogue of /root/reference/basedet/models/det/retinanet.py:14-232.
Redesigned for XLA static shapes:
  * per-image GT assignment (IoU matcher) runs under jax.vmap over the padded
    (B, K, 5) gt tensor instead of a python loop (:215-232);
  * inference's "filter > thresh then top-1000" becomes a fixed-k
    ``lax.top_k`` with below-threshold entries masked to -inf (:181-196) —
    identical candidate set, static shapes;
  * NMS is the tiled static-shape kernel from basedet_tpu.ops.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from basedet_tpu.layers.backbone.fpn import FPN
from basedet_tpu.layers.common.anchor_generator import DefaultAnchorGenerator
from basedet_tpu.layers.common.matcher import Matcher
from basedet_tpu.layers.common.post_processing import post_processing
from basedet_tpu.layers.common.function import onehot_gather_rows, topk_scores
from basedet_tpu.layers.head.retina_head import RetinaNetHead
from basedet_tpu.layers.losses import sigmoid_focal_loss, smooth_l1_loss
from basedet_tpu.models.base_net import BaseNet
from basedet_tpu.layers.backbone.build import make_backbone
from basedet_tpu.ops.nms import NEG_INF
from basedet_tpu.structures import BoxCoder, box_iou
from basedet_tpu.utils import registers


class RetinaNetModule(nn.Module):
    """Backbone → FPN → head. Returns per-level (logits, offsets) in NHWC."""

    backbone_name: str = "resnet50"
    backbone_norm: str = "FrozenBN"
    freeze_at: int = 2
    backbone_out_features: Sequence[str] = ("res3", "res4", "res5")
    fpn_strides: Sequence[int] = (8, 16, 32, 64, 128)
    fpn_out_channels: int = 256
    fpn_norm: str = None
    fpn_top_block_in_feature: str = "res5"
    num_anchors: int = 9
    num_classes: int = 80
    head_num_convs: int = 4
    prior_prob: float = 0.01
    share_param: bool = True
    train: bool = False

    @nn.compact
    def __call__(self, image: jnp.ndarray):
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
        import math

        level_names = [f"p{int(math.log2(s))}" for s in self.fpn_strides]
        features = [feats[n] for n in level_names]
        logits, offsets = RetinaNetHead(
            num_anchors=self.num_anchors,
            num_classes=self.num_classes,
            num_levels=len(features),
            num_convs=self.head_num_convs,
            prior_prob=self.prior_prob,
            share_param=self.share_param,
            name="head",
        )(features)
        return logits, offsets


def _flatten_level(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """(N, H, W, A*k) -> (N, H*W*A, k) matching anchor grid-major order
    (reference permute_to_N_Any_K, layers/common/function.py).

    Also the fp32 choke point under the bf16 compute policy: loss math and
    box decoding downstream always run in fp32."""
    n, h, w, _ = x.shape
    return x.reshape(n, h * w * (x.shape[-1] // k), k).astype(jnp.float32)


@registers.models.register()
class RetinaNet(BaseNet):
    def __init__(self, cfg):
        super().__init__(cfg)
        m = cfg.MODEL
        self.anchor_gen = DefaultAnchorGenerator(
            anchor_scales=m.ANCHOR.SCALES,
            anchor_ratios=m.ANCHOR.RATIOS,
            strides=m.FPN.STRIDES,
            offset=m.ANCHOR.OFFSET,
        )
        self.box_coder = BoxCoder(tuple(m.BOX_REG.MEAN), tuple(m.BOX_REG.STD))
        self.matcher = Matcher(
            tuple(m.MATCHER.THRESHOLDS),
            tuple(m.MATCHER.LABELS),
            m.MATCHER.ALLOW_LOW_QUALITY,
        )
        self.strides = tuple(m.FPN.STRIDES)

    def make_module(self, train: bool) -> RetinaNetModule:
        m = self.cfg.MODEL
        return RetinaNetModule(
            backbone_name=m.BACKBONE.NAME,
            backbone_norm=m.BACKBONE.NORM,
            freeze_at=m.BACKBONE.FREEZE_AT,
            backbone_out_features=tuple(m.BACKBONE.OUT_FEATURES),
            fpn_strides=tuple(m.FPN.STRIDES),
            fpn_out_channels=m.FPN.OUT_CHANNELS,
            fpn_norm=m.FPN.NORM,
            fpn_top_block_in_feature=m.FPN.TOP_BLOCK_IN_FEATURE,
            num_anchors=self.anchor_gen.num_anchors,
            num_classes=self.num_classes,
            head_num_convs=m.HEAD.NUM_CONVS,
            prior_prob=m.HEAD.CLS_PRIOR_PROB,
            share_param=m.HEAD.get("SHARE_PARAM", True),
            train=train,
        )

    # -- ground truth ---------------------------------------------------------
    def _assign_single(self, anchors, gt_boxes, num_valid):
        """anchors (R, 4); gt_boxes (K, 5); num_valid scalar →
        (labels (R,), offsets (R, 4)). Reference get_ground_truth
        (retinanet.py:215-232) without the per-image python loop."""
        K = gt_boxes.shape[0]
        gt_valid = jnp.arange(K) < num_valid
        overlaps = box_iou(gt_boxes[:, :4], anchors)  # (K, R)
        match_idx, labels = self.matcher(overlaps, gt_valid)
        # one-hot matmul, not a gather: R anchors of 5-float rows serialize
        # on TPU (gather cost ~ row count); values are bit-identical
        matched = onehot_gather_rows(gt_boxes, match_idx)  # (R, 5)
        fg = labels == 1
        labels = jnp.where(fg, matched[:, 4].astype(jnp.int32), labels)
        offsets = self.box_coder.encode(anchors, matched[:, :4])
        # guard against log(0) NaNs from degenerate padded gt rows
        offsets = jnp.where(fg[:, None], offsets, 0.0)
        return labels, offsets

    # -- train ------------------------------------------------------------------
    def get_losses(self, variables, batch, rng=None):
        inputs = self.pre_process(batch, train=True)
        module = self.make_module(train=True)
        mutable = [k for k in variables if k == "batch_stats"]
        if mutable:
            (logits_list, offsets_list), new_state = module.apply(
                variables, inputs["image"], mutable=mutable
            )
        else:
            logits_list, offsets_list = module.apply(variables, inputs["image"])
            new_state = {}

        feat_sizes = [tuple(x.shape[1:3]) for x in logits_list]
        anchors_list = self.anchor_gen(feat_sizes)
        anchors = jnp.concatenate(anchors_list, axis=0)  # (R, 4)

        logits = jnp.concatenate(
            [_flatten_level(x, self.num_classes) for x in logits_list], axis=1
        )  # (B, R, C)
        offsets = jnp.concatenate(
            [_flatten_level(x, 4) for x in offsets_list], axis=1
        )  # (B, R, 4)

        gt_boxes = inputs["gt_boxes"]
        num_valid = inputs["img_info"][:, 4].astype(jnp.int32)
        labels, gt_offsets = jax.vmap(
            functools.partial(self._assign_single, anchors)
        )(gt_boxes, num_valid)
        labels = jax.lax.stop_gradient(labels)
        gt_offsets = jax.lax.stop_gradient(gt_offsets)

        valid = labels >= 0
        fg = labels > 0
        num_fg = jnp.maximum(jnp.sum(fg), 1).astype(jnp.float32)

        gt_targets = jax.nn.one_hot(
            jnp.where(fg, labels - 1, -1), self.num_classes, dtype=logits.dtype
        )
        lcfg = self.cfg.MODEL.LOSSES
        cls_loss = jnp.sum(
            sigmoid_focal_loss(
                logits, gt_targets,
                alpha=lcfg.FOCAL_LOSS_ALPHA, gamma=lcfg.FOCAL_LOSS_GAMMA,
            ) * valid[..., None]
        ) / num_fg
        reg_loss = (
            jnp.sum(
                smooth_l1_loss(offsets, gt_offsets, beta=lcfg.SMOOTH_L1_BETA)
                * fg[..., None]
            )
            / num_fg
            * lcfg.REG_LOSS_WEIGHT
        )
        total = cls_loss + reg_loss
        return total, {
            "total_loss": total,
            "cls_loss": cls_loss,
            "reg_loss": reg_loss,
        }, new_state

    # -- eval ---------------------------------------------------------------------
    def inference(self, variables, batch):
        inputs = self.pre_process(batch, train=False)
        module = self.make_module(train=False)
        logits_list, offsets_list = module.apply(variables, inputs["image"])

        feat_sizes = [tuple(x.shape[1:3]) for x in logits_list]
        anchors_list = self.anchor_gen(feat_sizes)
        test_cfg = self.cfg.TEST

        def single_image(per_level, img_info):
            cand_boxes, cand_scores, cand_labels = [], [], []
            for logits, offsets, anchors in zip(*per_level, anchors_list):
                R, C = logits.shape[0], logits.shape[1]
                scores = jax.nn.sigmoid(logits).reshape(-1)  # (R*C,)
                k = min(1000, scores.shape[0])
                top_scores, top_idx = topk_scores(scores, k)
                keep = top_scores > test_cfg.CLS_THRESHOLD
                anchor_idx = top_idx // C
                cls_idx = top_idx % C
                boxes = self.box_coder.decode(
                    anchors[anchor_idx], offsets[anchor_idx]
                )
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

        logits_b = [_flatten_level(x, self.num_classes) for x in logits_list]
        offsets_b = [_flatten_level(x, 4) for x in offsets_list]
        boxes, scores, labels, valid = jax.vmap(
            lambda lg, of, info: single_image((lg, of), info)
        )(logits_b, offsets_b, inputs["img_info"])
        return {
            "boxes": boxes,
            "box_scores": scores,
            "box_labels": labels,
            "valid": valid,
        }
