"""YOLO heads (flax.linen, NHWC).

Capability analogue of /root/reference/basedet/layers/head/yolo_head.py:14-121:
YOLOHead (YOLOv3 reshape-only head) and YOLOXHead (decoupled: 1x1 stem,
2 cls convs, 2 reg convs, cls/reg/obj 1x1 preds, prior-prob bias on cls/obj).
"""
from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from basedet_tpu.layers.blocks.yolo_block import _ConvBNAct, make_conv
from basedet_tpu.layers.precision import Conv as PConv


class YOLOXHead(nn.Module):
    num_classes: int
    mid_channels: int = 256
    act: str = "silu"
    depthwise: bool = False
    prior_prob: float = 0.01
    train: bool = False

    @nn.compact
    def __call__(self, features: List[jnp.ndarray]):
        BlockConv = make_conv(self.depthwise)
        bias_value = -math.log((1 - self.prior_prob) / self.prior_prob)
        bias_init = nn.initializers.constant(bias_value)
        kw = dict(act=self.act, train=self.train)

        logits, offsets, objs = [], [], []
        for lv, x in enumerate(features):
            x = _ConvBNAct(self.mid_channels, 1, 1, **kw,
                           name=f"stem_{lv}")(x)
            c = x
            for i in range(2):
                c = BlockConv(self.mid_channels, 3, 1, **kw,
                              name=f"cls_conv_{lv}_{i}")(c)
            r = x
            for i in range(2):
                r = BlockConv(self.mid_channels, 3, 1, **kw,
                              name=f"reg_conv_{lv}_{i}")(r)
            logits.append(
                PConv(self.num_classes, (1, 1), bias_init=bias_init,
                      name=f"cls_pred_{lv}")(c)
            )
            offsets.append(PConv(4, (1, 1), name=f"reg_pred_{lv}")(r))
            objs.append(
                PConv(1, (1, 1), bias_init=bias_init,
                      name=f"obj_pred_{lv}")(r)
            )
        return logits, offsets, objs


class YOLOHead(nn.Module):
    """YOLOv3 head: per-level 3x3 conv + 1x1 prediction to
    A·(5 + C) channels (yolo_head.py:14-33)."""

    num_classes: int
    num_anchors: int = 3
    act: str = "lrelu"
    train: bool = False

    @nn.compact
    def __call__(self, features: List[jnp.ndarray]):
        preds = []
        for lv, x in enumerate(features):
            c = x.shape[-1]
            x = _ConvBNAct(c * 2, 3, 1, act=self.act, train=self.train,
                           name=f"conv_{lv}")(x)
            preds.append(
                PConv(
                    self.num_anchors * (5 + self.num_classes), (1, 1),
                    name=f"pred_{lv}",
                )(x)
            )
        return preds
