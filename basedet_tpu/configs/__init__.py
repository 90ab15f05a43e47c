from .base_cfg import BaseConfig
from .detection_cfg import DetectionConfig
from .det_model import *  # noqa: F401,F403

__all__ = ["BaseConfig", "DetectionConfig"]
