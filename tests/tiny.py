"""Shared tiny-model config shrinking for CPU CI.

XLA:CPU compile time of a full train/inference graph dominates the suite
(minutes per model at production widths). These helpers cut graph size while
keeping every code path live: all FPN levels, ≥2 anchors/level, all loss
branches, NMS/post-process, multi-level heads.
"""
from __future__ import annotations


def shrink(cfg):
    """Shrink any model config in place (returns it for chaining)."""
    m = cfg.MODEL
    if m.BACKBONE.get("NAME", "").startswith("resnet"):
        m.BACKBONE.NAME = "resnet10"
    if "FPN" in m and "OUT_CHANNELS" in m.FPN:
        m.FPN.OUT_CHANNELS = 64
    if "ANCHOR" in m and "SCALES" in m.ANCHOR and "RATIOS" in m.ANCHOR:
        # 2 scales x 1 ratio keeps the multi-anchor code path live
        # (YOLOv3-style (w, h) anchors have no RATIOS — leave those alone)
        m.ANCHOR.SCALES = [s[:2] for s in m.ANCHOR.SCALES]
        m.ANCHOR.RATIOS = [r[:1] for r in m.ANCHOR.RATIOS]
    if "HEAD" in m and "NUM_CONVS" in m.HEAD:
        m.HEAD.NUM_CONVS = 1
    if "RPN" in m:
        m.RPN.TRAIN_PREV_NMS_TOPK = 200
        m.RPN.TRAIN_POST_NMS_TOPK = 100
        m.RPN.TEST_PREV_NMS_TOPK = 200
        m.RPN.TEST_POST_NMS_TOPK = 100
        m.RCNN.NUM_ROIS = 64
    if "TRANSFORMER" in m:
        m.TRANSFORMER.NUM_ENCODERS = 1
        m.TRANSFORMER.NUM_DECODERS = 1
        m.NUM_QUERIES = 16
    if m.NAME == "CenterNet":
        m.HEAD.DECONV_CHANNEL = [512, 64, 32, 16]
        m.HEAD.IN_CHANNELS = 16
    if m.NAME in ("YOLOX", "YOLOv3"):
        if "DEPTH_FACTOR" in m:
            m.DEPTH_FACTOR = 0.33
            m.WIDTH_FACTOR = 0.25
    return cfg


def tiny_retinanet_cfg():
    from basedet_tpu.configs import RetinaNetConfig

    return shrink(RetinaNetConfig())
