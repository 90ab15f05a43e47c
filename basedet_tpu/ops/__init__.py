from .iou_pallas import box_iou_pallas
from .nms import NEG_INF, batched_nms_padded, nms_padded
from .roi_align import multilevel_roi_align, roi_align

__all__ = [
    "NEG_INF",
    "batched_nms_padded",
    "box_iou_pallas",
    "multilevel_roi_align",
    "nms_padded",
    "roi_align",
]
