"""RetinaNet R50-FPN 1x COCO (user config protocol —
reference playground/examples/retinanet/res50_coco_800size_1x/config.py)."""
from basedet_tpu.configs import RetinaNetConfig


class Cfg(RetinaNetConfig):
    def __init__(self):
        super().__init__()
        self.GLOBAL.OUTPUT_DIR = "logs/retinanet_r50_1x"
        self.GLOBAL.CKPT_SAVE_DIR = "logs/retinanet_r50_1x/ckpt"
