"""Dataloader builders (registry-dispatched from DATA.BUILDER_NAME).

Capability analogue of /root/reference/basedet/data/build.py:119-227
(DataloaderBuilder / DETRDataloaderBuilder / YOLOXDataloaderBuilder +
build_test_dataloader). The host-side pipeline produces static-shape NHWC
batches: images padded to a size bucket, gt padded to MAX_INSTANCES, im_info
carrying true sizes/counts — the TPU analogue of DetectionPadCollator.
"""
from __future__ import annotations

from typing import Iterator, Optional

from basedet_tpu.utils import logger, registers
from basedet_tpu.utils.dummy import DummyLoader


class _InfiniteIter:
    """Wraps a finite per-epoch loader into an infinite stream (the
    reference's Infinite sampler, data/build.py ENABLE_INFINITE_SAMPLER)."""

    def __init__(self, make_iter):
        self._make_iter = make_iter
        self._it = iter(make_iter())

    def __iter__(self):
        return self

    def __next__(self):
        try:
            return next(self._it)
        except StopIteration:
            self._it = iter(self._make_iter())
            return next(self._it)


@registers.dataloader.register()
class DataloaderBuilder:
    """Default detection dataloader: dataset → transforms → group sampler →
    pad collator. Falls back to DummyLoader when the dataset name is
    "dummy" (tests/benchmarks without COCO on disk)."""

    @classmethod
    def build(cls, cfg):
        import jax

        name = cfg.DATA.TRAIN.get("name", "dummy")
        world = jax.device_count()
        global_batch = cfg.MODEL.BATCHSIZE * world
        if name == "dummy":
            size = tuple(cfg.DATA.get("DUMMY_IMAGE_SIZE", (512, 512)))
            loader = DummyLoader(
                batch_size=global_batch,
                image_size=size,
                max_instances=cfg.DATA.get("MAX_INSTANCES", 100),
                num_classes=cfg.DATA.NUM_CLASSES,
            )
            return _InfiniteIter(lambda: iter(loader))
        from basedet_tpu.data.coco_loader import build_coco_train_loader

        return build_coco_train_loader(cfg, global_batch)


@registers.dataloader.register()
class YOLOXDataloaderBuilder:
    """Mosaic/MixUp pipeline (reference data/build.py:188-227): COCO →
    MosaicDataset → random sampling → pad collator at the (static) input
    size. The no-aug phase toggles ``enable_mosaic`` on the returned
    loader's ``.mosaic_dataset``."""

    @classmethod
    def build(cls, cfg):
        import jax

        world = jax.device_count()
        global_batch = cfg.MODEL.BATCHSIZE * world
        name = cfg.DATA.TRAIN.get("name", "dummy")
        if name == "dummy":
            size = tuple(cfg.AUG.TRAIN_SETTING.INPUT_SIZE)
            loader = DummyLoader(
                batch_size=global_batch,
                image_size=size,
                max_instances=cfg.DATA.get("MAX_INSTANCES", 100),
                num_classes=cfg.DATA.NUM_CLASSES,
            )
            return _InfiniteIter(lambda: iter(loader))
        from basedet_tpu.data.coco_loader import build_yolox_train_loader

        return build_yolox_train_loader(cfg, global_batch)


@registers.dataloader.register()
class DETRDataloaderBuilder(DataloaderBuilder):
    """DETR pipeline: default builder + mask-emitting collator
    (reference data/build.py:180-186)."""

    @classmethod
    def build(cls, cfg):
        import jax

        name = cfg.DATA.TRAIN.get("name", "dummy")
        world = jax.device_count()
        global_batch = cfg.MODEL.BATCHSIZE * world
        if name == "dummy":
            return super().build(cfg)
        from basedet_tpu.data.coco_loader import build_coco_train_loader

        return build_coco_train_loader(cfg, global_batch, with_mask=True)


def build_test_dataloader(cfg, dataset_name: Optional[str] = None):
    """Eval loader: contiguous shard per host, batch 1 semantics preserved
    (reference data/build.py:108-116 + InferenceSampler)."""
    name = dataset_name or cfg.DATA.TEST.get("name", "dummy")
    if name == "dummy":
        size = tuple(cfg.DATA.get("DUMMY_IMAGE_SIZE", (512, 512)))
        loader = DummyLoader(
            batch_size=1,
            image_size=size,
            max_instances=cfg.DATA.get("MAX_INSTANCES", 100),
            num_classes=cfg.DATA.NUM_CLASSES,
            length=8,
        )
        return loader
    from basedet_tpu.data.coco_loader import build_coco_test_loader

    return build_coco_test_loader(cfg, name)
