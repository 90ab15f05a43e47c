"""Pad collators: records → static-shape NHWC batches.

Capability analogue of /root/reference/basedet/data/collators/pad_collator.py:23-106
(DetectionPadCollator / DETRPadCollator). TPU-native twist: images pad to a
SIZE BUCKET (smallest multiple-of-32 bucket that fits the batch max, from a
fixed ladder) so that jit sees a small closed set of shapes instead of
arbitrary batch-max sizes; gt pads to a fixed MAX_INSTANCES.

Batch dict: data (B, H, W, 3) uint8-or-f32 (dtype follows the transform
outputs; uint8 ships to the device 4x cheaper and is cast on-chip),
gt_boxes (B, K, 5) [x1 y1 x2 y2 label], im_info (B, 5)
[cur_h, cur_w, orig_h, orig_w, num_instances]
(row layout matches pad_collator.py:48), mask (B, H, W) uint8 for DETR.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from basedet_tpu.native.pack import CanvasRing, pack_images


def _round32(x: int) -> int:
    return (x + 31) // 32 * 32


def pick_bucket(
    h: int, w: int, buckets: Optional[Sequence[Tuple[int, int]]]
) -> Tuple[int, int]:
    if buckets:
        for bh, bw in buckets:
            if h <= bh and w <= bw:
                return bh, bw
        return buckets[-1]
    return _round32(h), _round32(w)


class DetectionPadCollator:
    def __init__(
        self,
        max_instances: int = 100,
        size_buckets: Optional[Sequence[Tuple[int, int]]] = None,
        pad_value: float = 0.0,
        with_mask: bool = False,
    ):
        self.max_instances = max_instances
        self.size_buckets = (
            [tuple(b) for b in size_buckets] if size_buckets else None
        )
        self.pad_value = pad_value
        self.with_mask = with_mask  # DETR: emit per-pixel valid mask
        self._ring = CanvasRing()

    def __call__(self, records: List[dict]) -> dict:
        B = len(records)
        max_h = max(r["image"].shape[0] for r in records)
        max_w = max(r["image"].shape[1] for r in records)
        H, W = pick_bucket(max_h, max_w, self.size_buckets)
        K = self.max_instances

        # fused native pack (C++, basedet_tpu/native); uint8 inputs stay
        # uint8 so the host->TPU transfer is 4x smaller — models cast to
        # the compute dtype on device (data_to_input)
        data, masks = pack_images(
            [np.asarray(r["image"]) for r in records],
            H, W, self.pad_value, with_mask=self.with_mask, ring=self._ring,
        )
        gt = np.zeros((B, K, 5), np.float32)
        info = np.zeros((B, 5), np.float32)
        image_ids = []

        for b, r in enumerate(records):
            img = r["image"]
            h, w = img.shape[:2]
            boxes = r.get("boxes", np.zeros((0, 4), np.float32))
            labels = r.get("labels", np.zeros((0,), np.int32))
            n = min(len(boxes), K)
            if n:
                gt[b, :n, :4] = boxes[:n]
                gt[b, :n, 4] = labels[:n]
            oh, ow = r.get("orig_size", (h, w))
            info[b] = [h, w, oh, ow, n]
            image_ids.append(r.get("image_id", b))

        batch = {"data": data, "gt_boxes": gt, "im_info": info,
                 "image_id": np.asarray(image_ids)}
        if masks is not None:
            batch["mask"] = masks
        return batch


class DETRPadCollator(DetectionPadCollator):
    """Adds the per-pixel valid mask channel DETR's attention needs
    (reference pad_collator.py:64-106)."""

    def __init__(self, **kwargs):
        kwargs["with_mask"] = True
        super().__init__(**kwargs)
