"""End-to-end data pipeline test on a synthetic on-disk COCO dataset."""
import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from basedet_tpu.data.coco_loader import TestLoader, _MappedLoader
from basedet_tpu.data.collators.pad_collator import DetectionPadCollator
from basedet_tpu.data.datasets.coco import COCODataset
from basedet_tpu.data.samplers.samplers import AspectRatioGroupSampler
from basedet_tpu.data.transforms.transforms import (
    RandomHorizontalFlip,
    ShortestEdgeResize,
    TransformCompose,
)


@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    aid = 1
    sizes = [(120, 160), (160, 120), (100, 100), (80, 140)]
    for i, (h, w) in enumerate(sizes, start=1):
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(str(img_dir / f"{i:06d}.jpg"), img)
        images.append(
            dict(id=i, file_name=f"{i:06d}.jpg", height=h, width=w)
        )
        for _ in range(2):
            bw, bh = int(rng.randint(10, w // 2)), int(rng.randint(10, h // 2))
            x, y = int(rng.randint(0, w - bw)), int(rng.randint(0, h - bh))
            annotations.append(
                dict(
                    id=aid, image_id=i, category_id=int(rng.choice([1, 3, 18])),
                    bbox=[float(x), float(y), float(bw), float(bh)],
                    area=float(bw * bh), iscrowd=0,
                )
            )
            aid += 1
    categories = [
        dict(id=1, name="person"),
        dict(id=3, name="car"),
        dict(id=18, name="dog"),
    ]
    anno = dict(images=images, annotations=annotations, categories=categories)
    anno_path = root / "instances.json"
    anno_path.write_text(json.dumps(anno))
    return str(img_dir), str(anno_path)


def test_dataset_load_and_remap(coco_dir):
    img_dir, anno = coco_dir
    ds = COCODataset(img_dir, anno)
    assert len(ds) == 4
    # category ids (1, 3, 18) remap to contiguous labels (1, 2, 3)
    assert ds.cat_id_to_label == {1: 1, 3: 2, 18: 3}
    rec = ds[0]
    assert rec["image"].ndim == 3 and rec["image"].shape[2] == 3
    assert rec["boxes"].shape[1] == 4
    assert rec["labels"].min() >= 1


def test_transforms_keep_boxes_consistent(coco_dir):
    img_dir, anno = coco_dir
    ds = COCODataset(img_dir, anno)
    t = TransformCompose(
        [ShortestEdgeResize(64, 128), RandomHorizontalFlip(prob=1.0)]
    )
    rec = t(ds[0])
    h, w = rec["image"].shape[:2]
    assert min(h, w) == 64 or max(h, w) == 128
    b = rec["boxes"]
    assert (b[:, 0] <= b[:, 2]).all() and (b[:, 1] <= b[:, 3]).all()
    assert (b[:, 2] <= w + 1e-3).all() and (b[:, 3] <= h + 1e-3).all()


def test_full_train_loader(coco_dir):
    img_dir, anno = coco_dir
    ds = COCODataset(img_dir, anno)
    transform = TransformCompose([ShortestEdgeResize(64, 128)])
    sampler = AspectRatioGroupSampler(ds.aspect_ratios(), batch_size=2)
    collator = DetectionPadCollator(max_instances=10)
    loader = _MappedLoader(ds, transform, lambda: iter(sampler), collator)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["data"].shape[0] == 2 and b["data"].shape[3] == 3
    assert b["data"].shape[1] % 32 == 0 and b["data"].shape[2] % 32 == 0
    assert b["gt_boxes"].shape == (2, 10, 5)
    assert b["im_info"].shape == (2, 5)
    n = int(b["im_info"][0, 4])
    assert (b["gt_boxes"][0, :n, 4] >= 1).all()


def test_test_loader_covers_dataset(coco_dir):
    img_dir, anno = coco_dir
    ds = COCODataset(img_dir, anno, remove_images_without_annotations=False)
    collator = DetectionPadCollator(max_instances=10)
    loader = TestLoader(ds, None, collator, batch_size=1)
    ids = [int(b["image_id"][0]) for b in loader]
    assert sorted(ids) == [1, 2, 3, 4]


def test_prefetch_error_then_dead():
    """A producer exception is re-raised once; subsequent next() calls raise
    StopIteration immediately instead of blocking forever."""
    from basedet_tpu.data.coco_loader import PrefetchIterator

    def boom():
        raise ValueError("producer failed")
        yield  # pragma: no cover

    it = PrefetchIterator(boom, infinite=True)
    with pytest.raises(ValueError, match="producer failed"):
        next(it)
    with pytest.raises(StopIteration):
        next(it)
    it.close()  # idempotent
    with pytest.raises(StopIteration):
        next(it)


def test_prefetch_finite_exhaust_then_dead():
    from basedet_tpu.data.coco_loader import PrefetchIterator

    it = PrefetchIterator(lambda: iter([1, 2]), infinite=False)
    assert list(it) == [1, 2]
    with pytest.raises(StopIteration):
        next(it)


def test_multiworker_loader_matches_inline(coco_dir):
    """num_workers>0 must not pickle the loader (it holds the Pool) and must
    produce the same batches as the inline path (regression: pool.map on a
    bound method raised NotImplementedError)."""
    img_dir, anno = coco_dir
    ds = COCODataset(img_dir, anno)
    transform = TransformCompose([ShortestEdgeResize(64, 128)])
    collator = DetectionPadCollator(max_instances=10)

    def sampler_factory():
        return iter([[0, 1], [2, 3]])

    inline = _MappedLoader(ds, transform, sampler_factory, collator,
                           num_workers=0)
    pooled = _MappedLoader(ds, transform, sampler_factory, collator,
                           num_workers=1)
    b_in = list(inline)
    b_mp = list(pooled)
    pooled.close()
    assert pooled._pool is None  # close() terminates + drops the pool
    assert len(b_in) == len(b_mp) == 2
    for a, b in zip(b_in, b_mp):
        assert a["data"].shape == b["data"].shape
        np.testing.assert_array_equal(a["im_info"], b["im_info"])


def _rng_probe(_):
    import random

    import numpy as np

    return (random.random(), float(np.random.rand()))


def test_pool_workers_reseeded(coco_dir):
    """Fork workers must NOT inherit identical RNG state: with 2 workers the
    (random, np.random) draws must differ between workers, else every worker
    replays the same mosaic/affine/HSV sequence."""
    import random

    import numpy as np

    from basedet_tpu.data.coco_loader import _MappedLoader

    random.seed(0)
    np.random.seed(0)
    img_dir, anno = coco_dir
    ds = COCODataset(img_dir, anno)
    loader = _MappedLoader(ds, None, None, None, num_workers=2)
    pool = loader._get_pool()
    try:
        draws = set(pool.map(_rng_probe, range(2), chunksize=1))
        # both workers drew; identical inherited state would collapse the set
        assert len(draws) == 2
        # and neither replays the parent's post-seed sequence
        parent = (random.random(), float(np.random.rand()))
        assert parent not in draws
    finally:
        loader.close()


def test_prefetch_close_runs_on_close():
    from basedet_tpu.data.coco_loader import PrefetchIterator

    closed = []
    it = PrefetchIterator(lambda: iter([1]), infinite=False,
                          on_close=lambda: closed.append(True))
    assert next(it) == 1
    it.close()
    assert closed == [True]


class _FlagDataset:
    """Picklable dataset whose samples report a mutable flag (stand-in for
    MosaicDataset.enable_mosaic)."""

    def __init__(self):
        self.flag = True

    def __len__(self):
        return 4

    def __getitem__(self, i):
        return self.flag


def test_pool_restart_propagates_dataset_flags():
    """Workers snapshot the dataset at fork: an in-place flag flip (the
    YOLOX no-aug switch, engine/build.py YoloxNoAugHook) must be followed by
    request_pool_restart() to reach a live pool."""
    from basedet_tpu.data.coco_loader import _MappedLoader, _pool_load_one

    ds = _FlagDataset()
    loader = _MappedLoader(ds, None, None, None, num_workers=1)
    try:
        assert loader._get_pool().map(_pool_load_one, [0]) == [True]
        ds.flag = False
        # live pool still sees the fork-time snapshot
        assert loader._get_pool().map(_pool_load_one, [0]) == [True]
        loader.request_pool_restart()
        assert loader._get_pool().map(_pool_load_one, [0]) == [False]
    finally:
        loader.close()
