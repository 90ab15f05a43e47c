from .atss_cfg import ATSSConfig
from .fcos_cfg import FCOSConfig
from .retinanet_cfg import RetinaNetConfig

__all__ = ["ATSSConfig", "FCOSConfig", "RetinaNetConfig"]
