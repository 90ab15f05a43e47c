from .coco import COCODataset
from .info import resolve_dataset

__all__ = ["COCODataset", "resolve_dataset"]
