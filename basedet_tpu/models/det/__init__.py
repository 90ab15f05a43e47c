from .atss import ATSS
from .fcos import FCOS
from .retinanet import RetinaNet

__all__ = ["ATSS", "FCOS", "RetinaNet"]
