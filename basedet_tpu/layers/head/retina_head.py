"""RetinaNet classification + box-regression head (flax.linen, NHWC).

Capability analogue of /root/reference/basedet/layers/head/retina_head.py:9-141:
num_convs 3x3 convs per subnet (shared across levels by default), normal(0.01)
init, prior-probability bias on the classifier output.
"""
from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from basedet_tpu.layers.precision import Conv


class RetinaNetHead(nn.Module):
    num_anchors: int
    num_classes: int
    num_levels: int = 5
    num_convs: int = 4
    prior_prob: float = 0.01
    share_param: bool = True

    @nn.compact
    def __call__(
        self, features: Sequence[jnp.ndarray]
    ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        """features: list of (N, H, W, C). Returns per-level
        (logits (N, H, W, A*num_classes), offsets (N, H, W, A*4))."""
        winit = nn.initializers.normal(0.01)
        bias_value = -math.log((1 - self.prior_prob) / self.prior_prob)

        def subnets(suffix: str):
            convs = [
                Conv(features[0].shape[-1], (3, 3), padding=1,
                        kernel_init=winit, name=f"{suffix}_subnet_{i}")
                for i in range(self.num_convs)
            ]
            return convs

        if self.share_param:
            cls_convs = subnets("cls")
            bbox_convs = subnets("bbox")
            cls_score = Conv(
                self.num_anchors * self.num_classes, (3, 3), padding=1,
                kernel_init=winit,
                bias_init=nn.initializers.constant(bias_value),
                name="cls_score",
            )
            bbox_pred = Conv(
                self.num_anchors * 4, (3, 3), padding=1,
                kernel_init=winit, name="bbox_pred",
            )
            per_level = [(cls_convs, bbox_convs, cls_score, bbox_pred)] * len(features)
        else:
            per_level = []
            for lv in range(len(features)):
                per_level.append(
                    (
                        [Conv(features[0].shape[-1], (3, 3), padding=1,
                                 kernel_init=winit, name=f"cls_subnet_l{lv}_{i}")
                         for i in range(self.num_convs)],
                        [Conv(features[0].shape[-1], (3, 3), padding=1,
                                 kernel_init=winit, name=f"bbox_subnet_l{lv}_{i}")
                         for i in range(self.num_convs)],
                        Conv(self.num_anchors * self.num_classes, (3, 3),
                                padding=1, kernel_init=winit,
                                bias_init=nn.initializers.constant(bias_value),
                                name=f"cls_score_l{lv}"),
                        Conv(self.num_anchors * 4, (3, 3), padding=1,
                                kernel_init=winit, name=f"bbox_pred_l{lv}"),
                    )
                )

        logits, offsets = [], []
        for feat, (cls_convs, bbox_convs, cls_score, bbox_pred) in zip(
            features, per_level
        ):
            c = feat
            for conv in cls_convs:
                c = jax.nn.relu(conv(c))
            b = feat
            for conv in bbox_convs:
                b = jax.nn.relu(conv(b))
            logits.append(cls_score(c))
            offsets.append(bbox_pred(b))
        return logits, offsets
