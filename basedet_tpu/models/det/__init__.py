from .atss import ATSS
from .fcos import FCOS
from .free_anchor import FreeAnchor
from .retinanet import RetinaNet

__all__ = ["ATSS", "FCOS", "FreeAnchor", "RetinaNet"]
