from .iou_pallas import box_iou_pallas
from .nms import NEG_INF, batched_nms_padded, nms_padded
from .roi_align import multilevel_roi_align, roi_align
from .roi_align_pallas import (
    multilevel_roi_align_fused,
    pool_rois_multilevel,
)
from .roi_align_separable import multilevel_roi_align_batched
from .subpixel import conv_transpose_s2_subpixel

__all__ = [
    "NEG_INF",
    "batched_nms_padded",
    "box_iou_pallas",
    "conv_transpose_s2_subpixel",
    "multilevel_roi_align",
    "multilevel_roi_align_batched",
    "multilevel_roi_align_fused",
    "nms_padded",
    "pool_rois_multilevel",
    "roi_align",
]
