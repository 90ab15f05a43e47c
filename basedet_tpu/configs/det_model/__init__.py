from .atss_cfg import ATSSConfig
from .fcos_cfg import FCOSConfig
from .freeanchor_cfg import FreeAnchorConfig
from .retinanet_cfg import RetinaNetConfig

__all__ = ["ATSSConfig", "FCOSConfig", "FreeAnchorConfig", "RetinaNetConfig"]
