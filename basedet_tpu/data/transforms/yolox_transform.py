"""YOLOX-specific numpy/cv2 augmentations.

Capability analogue of /root/reference/basedet/data/transforms/yolox_transform.py:10-201
(augment_hsv, random_affine, TrainTransform) — host-side CPU ops feeding the
static-shape collator.
"""
from __future__ import annotations

import math
import random
from typing import Tuple

import cv2
import numpy as np


def augment_hsv(img: np.ndarray, hgain=5, sgain=30, vgain=30) -> np.ndarray:
    """Random HSV jitter in place on uint8 BGR (yolox_transform.py:10-22)."""
    gains = np.random.uniform(-1, 1, 3) * [hgain, sgain, vgain]
    gains *= np.random.randint(0, 2, 3)
    img_hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
    gains = gains.astype(img.dtype)
    img_hsv[..., 0] = (img_hsv[..., 0] + gains[0]) % 180
    img_hsv[..., 1] = np.clip(img_hsv[..., 1] + gains[1], 0, 255)
    img_hsv[..., 2] = np.clip(img_hsv[..., 2] + gains[2], 0, 255)
    cv2.cvtColor(img_hsv, cv2.COLOR_HSV2BGR, dst=img)
    return img


def _aug_param(value, center=0.0) -> float:
    if isinstance(value, (int, float)):
        return random.uniform(center - value, center + value)
    return random.uniform(value[0], value[1])


def get_affine_matrix(
    target_size: Tuple[int, int], degrees=10.0, translate=0.1,
    scales=0.1, shear=10.0,
):
    """Rotation+scale+shear+translate matrix (yolox_transform.py:36-64)."""
    tw, th = target_size
    angle = _aug_param(degrees)
    scale = _aug_param(scales, center=1.0)
    R = cv2.getRotationMatrix2D(angle=angle, center=(0, 0), scale=scale)
    M = np.ones((2, 3))
    shear_x = math.tan(_aug_param(shear) * math.pi / 180)
    shear_y = math.tan(_aug_param(shear) * math.pi / 180)
    M[0] = R[0] + shear_y * R[1]
    M[1] = R[1] + shear_x * R[0]
    M[0, 2] = _aug_param(translate) * tw
    M[1, 2] = _aug_param(translate) * th
    return M, scale


def apply_affine_to_bboxes(boxes: np.ndarray, target_size, M) -> np.ndarray:
    """Warp xyxy boxes by the corner-point trick (yolox_transform.py:67-97)."""
    n = len(boxes)
    if n == 0:
        return boxes
    tw, th = target_size
    corners = np.ones((4 * n, 3))
    corners[:, :2] = boxes[:, [0, 1, 2, 3, 0, 3, 2, 1]].reshape(4 * n, 2)
    corners = (corners @ M.T).reshape(n, 8)
    xs = corners[:, 0::2]
    ys = corners[:, 1::2]
    out = boxes.copy()
    out[:, 0] = xs.min(1).clip(0, tw)
    out[:, 1] = ys.min(1).clip(0, th)
    out[:, 2] = xs.max(1).clip(0, tw)
    out[:, 3] = ys.max(1).clip(0, th)
    return out


def random_affine(
    img: np.ndarray, boxes: np.ndarray, target_size=(640, 640),
    degrees=10.0, translate=0.1, scales=0.1, shear=10.0,
):
    M, _ = get_affine_matrix(target_size, degrees, translate, scales, shear)
    img = cv2.warpAffine(img, M, dsize=target_size, borderValue=(114, 114, 114))
    boxes = apply_affine_to_bboxes(boxes, target_size, M)
    return img, boxes


class TrainTransform:
    """Final per-sample op: HSV jitter, random flip, degenerate-box filter
    (yolox_transform.py:146-201). Output boxes stay xyxy; padding to the
    fixed gt slot count is the collator's job here (vs the reference's
    pad-to-120-labels inside the transform)."""

    def __init__(self, flip_prob=0.5, hsv_prob=1.0):
        self.flip_prob = flip_prob
        self.hsv_prob = hsv_prob

    def __call__(self, img: np.ndarray, boxes: np.ndarray, labels: np.ndarray):
        if random.random() < self.hsv_prob:
            img = np.ascontiguousarray(img)
            augment_hsv(img)
        if random.random() < self.flip_prob:
            w = img.shape[1]
            img = np.ascontiguousarray(img[:, ::-1])
            if len(boxes):
                boxes = boxes.copy()
                boxes[:, [0, 2]] = w - boxes[:, [2, 0]]
        # drop degenerate boxes (w/h < 1 pixel after aug)
        if len(boxes):
            keep = ((boxes[:, 2] - boxes[:, 0]) > 1) & ((boxes[:, 3] - boxes[:, 1]) > 1)
            boxes, labels = boxes[keep], labels[keep]
        return img, boxes, labels
