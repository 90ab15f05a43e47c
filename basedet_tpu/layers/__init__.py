"""Flat layer namespace (reference basedet/layers/__init__.py:3-13)."""
from .backbone.build import build_backbone_module
from .backbone.yolo_fpn import YOLOFPN
from .backbone.yolo_pafpn import YOLOPAFPN
from .blocks.deformable import DeformConv, ModulatedDeformConv
from .blocks.pool import caffe_pooling_2d
from .blocks.transformer import MLP, Transformer, sine_position_embedding
from .blocks.yolo_block import Bottleneck, CSPLayer, DepthwiseConvBlock, Focus, SPPBottleneck
from .head.center_head import CenterHead, CenternetDeconv
from .head.point_head import PointHead
from .head.rcnn import RCNNPredictor
from .head.yolo_head import YOLOHead, YOLOXHead
from .precision import compute_dtype, set_compute_dtype
from .backbone.fpn import FPN
from .common.anchor_generator import (
    AnchorPointGenerator,
    DefaultAnchorGenerator,
    FastPointGenerator,
)
from .common.blocks import ConvBnAct, FrozenBatchNorm, get_activation, get_norm
from .common.matcher import (
    Matcher,
    SinkhornMatcher,
    hungarian_match_owner,
    sinkhorn_log,
    topk_dynamic_k_matching,
)
from .common.post_processing import post_processing
from .common.pre_processing import data_to_input, get_multiple_size, get_padded_tensor
from .head.retina_head import RetinaNetHead
from .losses import (
    binary_cross_entropy,
    iou_loss,
    pairwise_iou_ltrb,
    sigmoid_focal_loss,
    smooth_l1_loss,
    weighted_cross_entropy,
)

__all__ = [
    "AnchorPointGenerator",
    "ConvBnAct",
    "DefaultAnchorGenerator",
    "FPN",
    "FastPointGenerator",
    "FrozenBatchNorm",
    "Matcher",
    "RetinaNetHead",
    "SinkhornMatcher",
    "binary_cross_entropy",
    "data_to_input",
    "get_activation",
    "get_multiple_size",
    "get_norm",
    "get_padded_tensor",
    "hungarian_match_owner",
    "iou_loss",
    "pairwise_iou_ltrb",
    "post_processing",
    "sigmoid_focal_loss",
    "sinkhorn_log",
    "smooth_l1_loss",
    "topk_dynamic_k_matching",
    "weighted_cross_entropy",
]
