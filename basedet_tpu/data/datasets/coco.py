"""COCO detection dataset — native JSON parsing (no pycocotools).

Capability analogue of MegEngine's built-in COCO vision dataset used by the
reference (auto-registered at utils/registry.py:37-42, resolved by
``dataset_type="COCO"``). Loads instances_*.json, remaps the 90-id category
space to contiguous 1..80 labels (0 = background, matching the reference's
label convention, SURVEY.md §2.4), optionally drops images without
annotations (DATA.TRAIN.remove_images_without_annotations).
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from basedet_tpu.utils import logger


class COCODataset:
    def __init__(
        self,
        images_dir: str,
        anno_path: str,
        remove_images_without_annotations: bool = True,
        use_crowd: bool = False,
    ):
        self.images_dir = images_dir
        with open(anno_path) as f:
            coco = json.load(f)

        cats = sorted(coco["categories"], key=lambda c: c["id"])
        self.cat_ids = [c["id"] for c in cats]
        self.cat_names = [c["name"] for c in cats]
        # contiguous labels 1..C (0 is background)
        self.cat_id_to_label = {cid: i + 1 for i, cid in enumerate(self.cat_ids)}
        self.label_to_cat_id = {v: k for k, v in self.cat_id_to_label.items()}

        anns_by_img: Dict[int, List[dict]] = {}
        for a in coco.get("annotations", []):
            anns_by_img.setdefault(a["image_id"], []).append(a)

        self.items: List[dict] = []
        for img in coco["images"]:
            anns = anns_by_img.get(img["id"], [])
            boxes, labels, iscrowd = [], [], []
            for a in anns:
                if a.get("ignore", False):
                    continue
                x, y, w, h = a["bbox"]
                if w <= 0 or h <= 0:
                    continue
                crowd = a.get("iscrowd", 0)
                if crowd and not use_crowd:
                    continue
                boxes.append([x, y, x + w, y + h])
                labels.append(self.cat_id_to_label[a["category_id"]])
                iscrowd.append(crowd)
            if remove_images_without_annotations and not boxes:
                continue
            self.items.append(
                dict(
                    id=img["id"],
                    file_name=img["file_name"],
                    height=img["height"],
                    width=img["width"],
                    boxes=np.asarray(boxes, np.float32).reshape(-1, 4),
                    labels=np.asarray(labels, np.int32),
                    iscrowd=np.asarray(iscrowd, np.int32),
                )
            )
        logger.info(
            f"loaded {len(self.items)} images from {anno_path} "
            f"({len(self.cat_ids)} categories)"
        )

    def __len__(self) -> int:
        return len(self.items)

    def image_path(self, idx: int) -> str:
        return os.path.join(self.images_dir, self.items[idx]["file_name"])

    def load_image(self, idx: int) -> np.ndarray:
        """Returns HWC uint8 BGR (the reference's channel convention —
        IMG_MEAN is BGR, extra_cfg.py:52)."""
        import cv2

        img = cv2.imread(self.image_path(idx), cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(self.image_path(idx))
        return img

    def __getitem__(self, idx: int) -> dict:
        item = self.items[idx]
        return dict(
            image=self.load_image(idx),
            boxes=item["boxes"].copy(),
            labels=item["labels"].copy(),
            image_id=item["id"],
            orig_size=(item["height"], item["width"]),
        )

    def aspect_ratios(self) -> np.ndarray:
        return np.asarray(
            [it["height"] / it["width"] for it in self.items], np.float32
        )
