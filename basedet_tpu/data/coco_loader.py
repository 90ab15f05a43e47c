"""COCO train/test loader glue: dataset → transforms → sampler → collator,
with background-thread prefetch (the host must not starve the TPU —
SURVEY.md §7 hard part 7; the reference used multi-process MegEngine
DataLoader workers, data/build.py NUM_WORKERS).
"""
from __future__ import annotations

import queue
import threading
import weakref
from typing import Iterator, Optional

from basedet_tpu.data.collators.pad_collator import (
    DetectionPadCollator,
    DETRPadCollator,
)
from basedet_tpu.data.datasets.coco import COCODataset
from basedet_tpu.data.datasets.info import resolve_dataset
from basedet_tpu.data.samplers.samplers import (
    AspectRatioGroupSampler,
    InferenceSampler,
)
from basedet_tpu.data.transforms.transforms import build_transforms
from basedet_tpu.utils import logger


class _WorkerError:
    def __init__(self, exc: BaseException):
        self.exc = exc


def _close_impl(stop: threading.Event, q: queue.Queue, on_close=None):
    """Stop the producer cooperatively and drain the queue. Module-level so
    weakref.finalize holds no reference back to the iterator."""
    stop.set()
    try:
        while True:
            q.get_nowait()
    except queue.Empty:
        pass
    if on_close is not None:
        try:
            on_close()
        except Exception:
            pass


class PrefetchIterator:
    """Wraps an iterator factory with an N-deep background-thread prefetch.

    Worker failures propagate to the consumer instead of hanging ``next()``
    forever: an epoch that yields nothing (dataset smaller than the global
    batch) or an exception inside the producer is forwarded through the
    queue and re-raised, and the iterator goes dead (later ``next()`` calls
    raise StopIteration instead of blocking). ``close()`` (also run by a
    weakref finalizer at GC/interpreter exit) stops the thread cooperatively
    so teardown doesn't kill it mid-C++ call."""

    def __init__(self, make_iter, depth: int = 2, infinite: bool = True,
                 on_close=None):
        self._make_iter = make_iter
        self._depth = depth
        self._infinite = infinite
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._dead = False  # set once StopIteration/_WorkerError is delivered
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()
        # weakref-based finalizer: unlike atexit.register(self.close), this
        # does not keep the iterator (and its queued batches) alive for the
        # life of the interpreter. on_close (e.g. worker-pool terminate) runs
        # after the queue is drained.
        self._finalizer = weakref.finalize(
            self, _close_impl, self._stop, self._q, on_close
        )

    def _put(self, item) -> bool:
        """Blocking put that aborts when close() was called."""
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def _worker(self):
        try:
            while not self._stop.is_set():
                produced = False
                for item in self._make_iter():
                    produced = True
                    if not self._put(item):
                        return
                if not produced:
                    raise RuntimeError(
                        "dataloader epoch produced no batches — is the "
                        "dataset smaller than the global batch size "
                        "(MODEL.BATCHSIZE x device_count)?"
                    )
                if not self._infinite:
                    self._put(StopIteration)
                    return
        except BaseException as e:  # forward to the consumer
            self._put(_WorkerError(e))

    def close(self):
        self._dead = True
        self._finalizer()  # idempotent; also detaches the finalizer

    def __iter__(self):
        return self

    def __next__(self):
        if self._dead:
            raise StopIteration
        # Timed get + worker-alive check: once the worker thread has exited
        # (error already delivered, or died without enqueueing) an untimed
        # get() would block forever.
        while True:
            try:
                item = self._q.get(timeout=1.0)
                break
            except queue.Empty:
                if not self._thread.is_alive():
                    # final drain: the producer may have enqueued its last
                    # item (possibly a _WorkerError) between our timeout and
                    # its exit — don't silently drop it as a clean epoch end
                    try:
                        item = self._q.get_nowait()
                        break
                    except queue.Empty:
                        self._dead = True
                        raise StopIteration from None
        if item is StopIteration:
            self._dead = True
            raise StopIteration
        if isinstance(item, _WorkerError):
            self._dead = True
            raise item.exc
        return item


_WORKER_STATE: dict = {}


def _pool_worker_init(dataset, transform):
    _WORKER_STATE["dataset"] = dataset
    _WORKER_STATE["transform"] = transform
    # Fork-based workers inherit the parent's global RNG state; without a
    # per-worker reseed every worker draws the SAME mosaic companions /
    # affine / flip / HSV params (cf. torch DataLoader worker seeding).
    import os
    import random as _random

    import numpy as _np

    seed = int.from_bytes(os.urandom(4), "little") ^ os.getpid()
    _random.seed(seed)
    _np.random.seed(seed % (2 ** 32))


def _pool_load_one(i):
    rec = _WORKER_STATE["dataset"][i]
    tf = _WORKER_STATE["transform"]
    return tf(rec) if tf is not None else rec


class _MappedLoader:
    """Finite epoch iterator: sampler batches → transformed records → batch.

    ``num_workers > 0`` maps sample loading+augmentation over a fork-based
    process pool (the analogue of the reference's DataLoader NUM_WORKERS,
    data/build.py; mosaic/cv2 work is GIL-bound so threads don't help).
    Workers get (dataset, transform) once via the pool initializer — mapping
    a bound method would re-pickle the loader (and its un-picklable Pool)
    per task."""

    def __init__(self, dataset, transform, sampler_iter_factory, collator,
                 num_workers: int = 0):
        self.dataset = dataset
        self.transform = transform
        self.sampler_iter_factory = sampler_iter_factory
        self.collator = collator
        self.num_workers = num_workers
        self._pool = None
        self._restart_pool = False

    def _load_one(self, i):
        rec = self.dataset[i]
        if self.transform is not None:
            rec = self.transform(rec)
        return rec

    def request_pool_restart(self):
        """Re-fork the worker pool before the next batch: workers snapshot
        the dataset at fork, so in-place dataset flag flips (the YOLOX
        no-aug switch, reference engine/yolo_hooks.py toggling
        enable_mosaic) do not reach a live pool without this."""
        self._restart_pool = True

    def _get_pool(self):
        if self._restart_pool:
            self._restart_pool = False
            self.close()
        if self._pool is None:
            import multiprocessing as mp

            ctx = mp.get_context("fork")
            self._pool = ctx.Pool(
                self.num_workers, initializer=_pool_worker_init,
                initargs=(self.dataset, self.transform),
            )
        return self._pool

    def close(self):
        if self._pool is not None:
            self._pool.terminate()
            self._pool.join()
            self._pool = None

    def __iter__(self):
        for batch_idx in self.sampler_iter_factory():
            if self.num_workers > 0:
                records = self._get_pool().map(_pool_load_one, batch_idx)
            else:
                records = [self._load_one(i) for i in batch_idx]
            yield self.collator(records)


def build_coco_train_loader(cfg, global_batch: int, with_mask: bool = False):
    images_dir, anno = resolve_dataset(cfg.DATA.TRAIN.name)
    dataset = COCODataset(
        images_dir,
        anno,
        remove_images_without_annotations=cfg.DATA.TRAIN.get(
            "remove_images_without_annotations", True
        ),
    )
    transform = build_transforms(cfg.AUG.TRAIN_VALUE)
    sampler = AspectRatioGroupSampler(
        dataset.aspect_ratios(), batch_size=global_batch
    )
    collator_cls = DETRPadCollator if with_mask else DetectionPadCollator
    collator = collator_cls(
        max_instances=cfg.DATA.get("MAX_INSTANCES", 100),
        size_buckets=cfg.DATA.get("SIZE_BUCKETS", None),
    )
    loader = _MappedLoader(
        dataset, transform, lambda: iter(sampler), collator,
        num_workers=cfg.DATA.get("NUM_WORKERS", 0),
    )
    return PrefetchIterator(
        lambda: iter(loader), depth=2, infinite=True, on_close=loader.close
    )


def build_yolox_train_loader(cfg, global_batch: int):
    """Mosaic/MixUp loader at the (static) YOLOX input size."""
    import random as _random

    from basedet_tpu.data.datasets.mosaic_dataset import MosaicDataset
    from basedet_tpu.data.transforms.yolox_transform import TrainTransform

    images_dir, anno = resolve_dataset(cfg.DATA.TRAIN.name)
    dataset = COCODataset(images_dir, anno, remove_images_without_annotations=True)
    setting = cfg.AUG.TRAIN_SETTING
    mosaic_ds = MosaicDataset(
        dataset,
        img_size=tuple(setting.INPUT_SIZE),
        mosaic=True,
        preproc=TrainTransform(
            flip_prob=setting.get("FLIP_PROB", 0.5),
            hsv_prob=setting.get("HSV_PROB", 1.0),
        ),
        degrees=setting.DEGREES,
        translate=setting.TRANSLATE,
        mosaic_scale=tuple(setting.MOSAIC_SCALE),
        mixup_scale=tuple(setting.MIXUP_SCALE),
        shear=setting.SHEAR,
        enable_mixup=setting.ENABLE_MIXUP,
        mosaic_prob=setting.MOSAIC_PROB,
        mixup_prob=setting.MIXUP_PROB,
    )
    collator = DetectionPadCollator(
        max_instances=cfg.DATA.get("MAX_INSTANCES", 100)
    )

    mapped = _MappedLoader(
        mosaic_ds, None, None, collator,
        num_workers=cfg.DATA.get("NUM_WORKERS", 0),
    )

    def epoch_iter():
        idxs = list(range(len(mosaic_ds)))
        _random.shuffle(idxs)
        batches = [
            idxs[i:i + global_batch]
            for i in range(0, len(idxs) - global_batch + 1, global_batch)
        ]
        for batch_idx in batches:
            if mapped.num_workers > 0:
                records = mapped._get_pool().map(_pool_load_one, batch_idx)
            else:
                records = [mapped._load_one(i) for i in batch_idx]
            yield collator(records)

    loader = PrefetchIterator(
        epoch_iter, depth=2, infinite=True, on_close=mapped.close
    )
    loader.mosaic_dataset = mosaic_ds
    loader.mapped_loader = mapped
    return loader


class TestLoader:
    """Finite eval loader exposing .dataset for the evaluator."""

    def __init__(self, dataset, transform, collator, batch_size: int = 1,
                 rank: int = 0, world_size: int = 1):
        self.dataset = dataset
        self.transform = transform
        self.collator = collator
        self.batch_size = batch_size
        self.sampler = InferenceSampler(len(dataset), rank, world_size)

    def __iter__(self):
        batch = []
        for i in self.sampler:
            rec = self.dataset[i]
            if self.transform is not None:
                rec = self.transform(rec)
            batch.append(rec)
            if len(batch) == self.batch_size:
                yield self.collator(batch)
                batch = []
        if batch:
            yield self.collator(batch)

    def __len__(self):
        return (len(self.sampler) + self.batch_size - 1) // self.batch_size


def _default_test_buckets(min_size: int, max_size: int):
    """Static pad buckets covering every ShortestEdgeResize output shape:
    one dim == min_size (up to x32) with the other ≤ max_size, either
    orientation, plus a square fallback for extreme aspect ratios. Keeps the
    jitted inference at a handful of compilations instead of one per image."""
    lo = (min_size + 31) // 32 * 32
    hi = (max_size + 31) // 32 * 32
    # first-fit order: tightest first (collator picks the first that fits)
    return [(lo, lo), (lo, hi), (hi, lo), (hi, hi)]


def build_coco_test_loader(cfg, dataset_name: Optional[str] = None,
                           batch_size: int = 1):
    images_dir, anno = resolve_dataset(dataset_name or cfg.DATA.TEST.name)
    dataset = COCODataset(
        images_dir, anno, remove_images_without_annotations=False
    )
    transform = build_transforms(
        (
            (
                "ShortestEdgeResize",
                dict(
                    min_size=cfg.TEST.IMG_MIN_SIZE,
                    max_size=cfg.TEST.IMG_MAX_SIZE,
                    sample_style="choice",
                ),
            ),
        )
    )
    buckets = cfg.DATA.get("TEST_SIZE_BUCKETS", None) or _default_test_buckets(
        cfg.TEST.IMG_MIN_SIZE, cfg.TEST.IMG_MAX_SIZE
    )
    collator = DetectionPadCollator(
        max_instances=cfg.DATA.get("MAX_INSTANCES", 100),
        size_buckets=buckets,
    )
    return TestLoader(dataset, transform, collator, batch_size=batch_size)
