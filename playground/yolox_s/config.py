"""YOLOX-S 640px 300e (user config protocol — subclass and override)."""
from basedet_tpu.configs import YOLOXSConfig


class Cfg(YOLOXSConfig):
    def __init__(self):
        super().__init__()
        self.GLOBAL.OUTPUT_DIR = "logs/yolox_s"
        self.GLOBAL.CKPT_SAVE_DIR = "logs/yolox_s/ckpt"
