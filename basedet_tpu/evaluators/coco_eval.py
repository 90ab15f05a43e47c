"""COCO evaluator: run model inference over a dataset and compute box mAP.

Capability analogue of /root/reference/basedet/evaluators/coco_eval.py:72-172
(COCOEvaluator: preprocess → postprocess → format → save json → evaluate).
Differences by design: detections come back as fixed-size padded arrays
(valid-masked) from the jitted inference; category remap uses the dataset's
label↔category-id tables; COCOeval is the in-repo numpy implementation
(pycocotools is unavailable here).
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from basedet_tpu.utils import logger, registers

from .coco_metrics import evaluate_coco_map


@registers.evaluators.register()
class COCOEvaluator:
    def __init__(self, cfg):
        self.cfg = cfg
        self.save_path = os.path.join(
            cfg.GLOBAL.get("OUTPUT_DIR", "logs"), "predict_coco.json"
        )

    # -- collection --------------------------------------------------------------
    @staticmethod
    def detections_to_records(
        dets: Dict[str, np.ndarray],
        image_ids: List[int],
        label_to_cat_id: Optional[Dict[int, int]] = None,
    ) -> List[dict]:
        """Convert padded inference output {boxes, box_scores, box_labels,
        valid} (B, D, ...) to COCO result records (xywh, category_id).
        ``box_labels`` are 0-based class indices from the head."""
        records = []
        boxes = np.asarray(dets["boxes"])
        scores = np.asarray(dets["box_scores"])
        labels = np.asarray(dets["box_labels"])
        valid = np.asarray(dets["valid"])
        for b, img_id in enumerate(image_ids):
            for d in range(boxes.shape[1]):
                if not valid[b, d]:
                    continue
                x1, y1, x2, y2 = boxes[b, d].tolist()
                label = int(labels[b, d]) + 1  # 0-based head index → 1..C
                cat = (
                    label_to_cat_id[label]
                    if label_to_cat_id is not None
                    else label
                )
                records.append(
                    dict(
                        image_id=int(img_id),
                        category_id=int(cat),
                        bbox=[x1, y1, x2 - x1, y2 - y1],
                        score=float(scores[b, d]),
                    )
                )
        return records

    def save_results(self, records: List[dict]) -> None:
        os.makedirs(os.path.dirname(self.save_path) or ".", exist_ok=True)
        with open(self.save_path, "w") as f:
            json.dump(records, f)
        logger.info(f"saved {len(records)} detections to {self.save_path}")

    # -- evaluation ----------------------------------------------------------------
    def evaluate_records(self, records: List[dict], dataset) -> Dict[str, float]:
        """Evaluate result records against a COCODataset's annotations."""
        gt_by, dt_by = {}, {}
        img_ids = []
        for item in dataset.items:
            img_ids.append(item["id"])
            for box, label, crowd in zip(
                item["boxes"], item["labels"], item["iscrowd"]
            ):
                x1, y1, x2, y2 = box.tolist()
                gt_by.setdefault((item["id"], int(label)), []).append(
                    dict(
                        bbox=[x1, y1, x2 - x1, y2 - y1],
                        area=(x2 - x1) * (y2 - y1),
                        iscrowd=int(crowd),
                    )
                )
        cat_labels = sorted(dataset.label_to_cat_id.keys())
        cat_to_label = {v: k for k, v in dataset.label_to_cat_id.items()}
        for r in records:
            label = cat_to_label.get(r["category_id"], None)
            if label is None:
                continue
            dt_by.setdefault((r["image_id"], label), []).append(
                dict(bbox=r["bbox"], score=r["score"])
            )
        return evaluate_coco_map(gt_by, dt_by, img_ids, cat_labels)

    def evaluate_model(self, model, variables, dataloader) -> Dict[str, float]:
        """Full loop: inference over the test dataloader → metrics.

        The dataloader must yield dicts with data/im_info (+image_id list)
        and expose ``.dataset`` for annotations; DummyLoader-based loaders
        return a smoke metric only.
        """
        import jax

        records = []
        dataset = getattr(dataloader, "dataset", None)
        infer = jax.jit(
            lambda v, b: model.inference(v, b),
            static_argnames=(),
        )
        n_images = 0
        for batch in dataloader:
            image_ids = batch.pop("image_id", None)
            dets = infer(variables, {k: v for k, v in batch.items()
                                     if k in ("data", "im_info")})
            if image_ids is None:
                image_ids = list(range(n_images, n_images + len(batch["data"])))
            n_images += len(batch["data"])
            records.extend(
                self.detections_to_records(
                    dets,
                    list(np.asarray(image_ids)),
                    dataset.label_to_cat_id if dataset is not None else None,
                )
            )
        self.save_results(records)
        if dataset is None:
            return {"num_detections": float(len(records))}
        return self.evaluate_records(records, dataset)
