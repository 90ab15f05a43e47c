"""Detection visualization (reference evaluators/coco_eval.py:24-68
visualize_detection): cv2 box/label renderer."""
from __future__ import annotations

from typing import Optional, Sequence

import cv2
import numpy as np


def visualize_detection(
    img: np.ndarray,
    dets: np.ndarray,
    class_names: Optional[Sequence[str]] = None,
    score_threshold: float = 0.3,
    color=(0, 255, 0),
) -> np.ndarray:
    """img: HWC BGR uint8; dets: (N, 6) [x1, y1, x2, y2, score, label]."""
    img = img.copy()
    for det in dets:
        x1, y1, x2, y2, score = det[:5]
        if score < score_threshold:
            continue
        label = int(det[5]) if len(det) > 5 else -1
        cv2.rectangle(
            img, (int(x1), int(y1)), (int(x2), int(y2)), color, 2
        )
        name = (
            class_names[label]
            if class_names is not None and 0 <= label < len(class_names)
            else str(label)
        )
        cv2.putText(
            img, f"{name}:{score:.2f}", (int(x1), max(int(y1) - 4, 10)),
            cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1,
        )
    return img
