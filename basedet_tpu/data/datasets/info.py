"""Dataset name → path registry (reference data/datasets/info.py:9-63).

Root defaults to $BASEDET_DATA_DIR (same env protocol as the reference,
data/build.py:49-77).
"""
from __future__ import annotations

import os

from basedet_tpu.utils import registers


def data_root() -> str:
    return os.environ.get("BASEDET_DATA_DIR", "datasets")


_COCO_INFO = {
    "coco_2017_train": ("coco/train2017", "coco/annotations/instances_train2017.json"),
    "coco_2017_val": ("coco/val2017", "coco/annotations/instances_val2017.json"),
    "coco_2014_train": ("coco/train2014", "coco/annotations/instances_train2014.json"),
    "coco_2014_val": ("coco/val2014", "coco/annotations/instances_val2014.json"),
    "objects365_train": ("objects365/train", "objects365/annotations/objects365_train.json"),
    "objects365_val": ("objects365/val", "objects365/annotations/objects365_val.json"),
}

for name, (imgs, anno) in _COCO_INFO.items():
    registers.datasets_info.register(
        (imgs, anno), name=name
    )


def resolve_dataset(name: str):
    """Returns (images_dir, anno_path) absolute under the data root."""
    imgs, anno = registers.datasets_info.get(name)
    root = data_root()
    return os.path.join(root, imgs), os.path.join(root, anno)


def register_dataset(name: str, images_dir: str, anno_path: str) -> None:
    """Register a dataset by explicit paths (absolute paths bypass the data
    root — os.path.join semantics). Idempotent re-registration allowed for
    tools/tests."""
    registers.datasets_info.register(
        (images_dir, anno_path), name=name, overwrite=True
    )
