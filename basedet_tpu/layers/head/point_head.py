"""FCOS-style point head (flax.linen, NHWC).

Capability analogue of /root/reference/basedet/layers/head/point_head.py:17-212
(PointHead + OTAPointHead): shared 3x3 conv subnets with GroupNorm(32),
normal(0.01) init, prior-prob classifier bias, learnable per-level ``scales``
parameter, offsets decoded as ``relu(pred · scale) · stride``; the OTA
variant renames ctrness→IoU branch and optionally exp-decodes offsets.
"""
from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from basedet_tpu.layers.precision import Conv


class PointHead(nn.Module):
    num_classes: int
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    num_anchors: int = 1
    num_convs: int = 4
    prior_prob: float = 0.01
    with_norm: bool = True
    share_param: bool = True
    # OTA variant: exp decode instead of relu·scale·stride
    decode_mode: str = "relu_scale"  # "relu_scale" | "exp_scale"

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        winit = nn.initializers.normal(0.01)
        bias_value = -math.log((1 - self.prior_prob) / self.prior_prob)
        C = features[0].shape[-1]

        def make_subnets(suffix: str):
            cls_convs = [
                Conv(C, (3, 3), padding=1, kernel_init=winit,
                     name=f"cls_subnet{suffix}_{i}")
                for i in range(self.num_convs)
            ]
            bbox_convs = [
                Conv(C, (3, 3), padding=1, kernel_init=winit,
                     name=f"bbox_subnet{suffix}_{i}")
                for i in range(self.num_convs)
            ]
            cls_norms = [
                nn.GroupNorm(32, name=f"cls_gn{suffix}_{i}") if self.with_norm else None
                for i in range(self.num_convs)
            ]
            bbox_norms = [
                nn.GroupNorm(32, name=f"bbox_gn{suffix}_{i}") if self.with_norm else None
                for i in range(self.num_convs)
            ]
            cls_score = Conv(
                self.num_anchors * self.num_classes, (3, 3), padding=1,
                kernel_init=winit, bias_init=nn.initializers.constant(bias_value),
                name=f"cls_score{suffix}",
            )
            bbox_pred = Conv(
                self.num_anchors * 4, (3, 3), padding=1, kernel_init=winit,
                name=f"bbox_pred{suffix}",
            )
            ctrness_pred = Conv(
                self.num_anchors, (3, 3), padding=1, kernel_init=winit,
                name=f"ctrness{suffix}",
            )
            return (cls_convs, bbox_convs, cls_norms, bbox_norms,
                    cls_score, bbox_pred, ctrness_pred)

        # share_param=False gives every pyramid level its own subnet params
        # (reference point_head.py:17-151 supports both via cfg SHARE_PARAM)
        if self.share_param:
            shared = make_subnets("")
            subnets = [shared] * len(self.strides)
        else:
            subnets = [make_subnets(f"_l{lv}") for lv in range(len(self.strides))]
        scales = self.param(
            "scales", lambda rng: jnp.ones((len(self.strides),), jnp.float32)
        )

        logits, offsets, ctrness = [], [], []
        for lv, (feat, stride) in enumerate(zip(features, self.strides)):
            (cls_convs, bbox_convs, cls_norms, bbox_norms,
             cls_score, bbox_pred, ctrness_pred) = subnets[lv]
            c = feat
            for conv, norm in zip(cls_convs, cls_norms):
                c = conv(c)
                if norm is not None:
                    c = norm(c)
                c = jax.nn.relu(c)
            b = feat
            for conv, norm in zip(bbox_convs, bbox_norms):
                b = conv(b)
                if norm is not None:
                    b = norm(b)
                b = jax.nn.relu(b)
            logits.append(cls_score(c))
            raw = bbox_pred(b)
            if self.decode_mode == "relu_scale":
                offsets.append(jax.nn.relu(raw * scales[lv]) * stride)
            else:  # exp_scale (OTA head NORM_REG_TARGETS=False, point_head.py:205-209)
                offsets.append(jnp.exp(raw * scales[lv]))
            ctrness.append(ctrness_pred(b))
        return logits, offsets, ctrness
