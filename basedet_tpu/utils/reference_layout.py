"""Synthetic reference-LAYOUT state dicts for converter validation and the
parity-day rehearsal (tools/parity_eval.py --rehearse).

Param names transcribed from /root/reference/basedet/models/cls/resnet.py:
116-258 (trunk), layers/backbone/fpn_backbone.py:87-99 (FPN conv naming +
top block) and layers/head/retina_head.py:44-70 (share_param head), with
MegEngine's (1, C, 1, 1) BatchNorm parameter shapes.
"""
from __future__ import annotations

import numpy as np

R50_STAGES = [(64, 3), (128, 4), (256, 6), (512, 2 + 1)]  # (width, blocks)


def reference_retinanet_r50_state():
    """RetinaNet-R50-FPN state dict with the EXACT reference naming/shape
    layout; values enumerate insertion order (deterministic goldens)."""
    state = {}

    def add(name, shape):
        state[name] = np.full(shape, float(len(state)), np.float32)

    def add_bn(prefix, c):
        for field in ("weight", "bias", "running_mean", "running_var"):
            add(f"{prefix}.{field}", (1, c, 1, 1))  # MegEngine BN shape

    # ResNet-50 trunk (reference resnet.py:116-258; Bottleneck expansion 4)
    add("backbone.bottom_up.conv1.weight", (64, 3, 7, 7))
    add_bn("backbone.bottom_up.bn1", 64)
    in_c = 64
    for stage_i, (width, blocks) in enumerate(R50_STAGES, start=1):
        out_c = width * 4
        for b in range(blocks):
            p = f"backbone.bottom_up.layer{stage_i}.{b}"
            add(f"{p}.conv1.weight", (width, in_c if b == 0 else out_c, 1, 1))
            add_bn(f"{p}.bn1", width)
            add(f"{p}.conv2.weight", (width, width, 3, 3))
            add_bn(f"{p}.bn2", width)
            add(f"{p}.conv3.weight", (out_c, width, 1, 1))
            add_bn(f"{p}.bn3", out_c)
            if b == 0:  # downsample Sequential(conv, bn)
                add(f"{p}.downsample.0.weight", (out_c, in_c, 1, 1))
                add_bn(f"{p}.downsample.1", out_c)
        in_c = out_c

    # FPN laterals/outputs (fpn_backbone.py:87-90) + P6P7 top block (:198-199)
    for stage, c_in in ((3, 512), (4, 1024), (5, 2048)):
        add(f"backbone.fpn_lateral{stage}.weight", (256, c_in, 1, 1))
        add(f"backbone.fpn_lateral{stage}.bias", (256,))
        add(f"backbone.fpn_output{stage}.weight", (256, 256, 3, 3))
        add(f"backbone.fpn_output{stage}.bias", (256,))
    add("backbone.top_block.p6.weight", (256, 2048, 3, 3))
    add("backbone.top_block.p6.bias", (256,))
    add("backbone.top_block.p7.weight", (256, 256, 3, 3))
    add("backbone.top_block.p7.bias", (256,))

    # shared-param head (retina_head.py:48-70): 4 convs each subnet
    for sub in ("cls_subnet", "bbox_subnet"):
        for i in range(4):
            add(f"head.{sub}.{i}.weight", (256, 256, 3, 3))
            add(f"head.{sub}.{i}.bias", (256,))
    add("head.cls_score.weight", (9 * 80, 256, 3, 3))
    add("head.cls_score.bias", (9 * 80,))
    add("head.bbox_pred.weight", (9 * 4, 256, 3, 3))
    add("head.bbox_pred.bias", (9 * 4,))
    return state
