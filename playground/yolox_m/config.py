"""YOLOX-M 640px 300e (user config protocol — subclass and override)."""
from basedet_tpu.configs import YOLOXMConfig


class Cfg(YOLOXMConfig):
    def __init__(self):
        super().__init__()
        self.GLOBAL.OUTPUT_DIR = "logs/yolox_m"
        self.GLOBAL.CKPT_SAVE_DIR = "logs/yolox_m/ckpt"
