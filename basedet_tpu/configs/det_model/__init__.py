from .retinanet_cfg import RetinaNetConfig

__all__ = ["RetinaNetConfig"]
