"""Objects365 path end-to-end: the info-registry name resolves under
$BASEDET_DATA_DIR, the format-agnostic loader remaps the 365-category space
to contiguous labels, and a train dataloader built from a config yields
batches sized for NUM_CLASSES=365 (reference data/datasets/info.py:9-63 —
Objects365 is a first-class dataset there too)."""
import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from basedet_tpu.data.datasets.coco import COCODataset
from basedet_tpu.data.datasets.info import resolve_dataset


@pytest.fixture(scope="module")
def o365_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    img_dir = root / "objects365" / "train"
    anno_dir = root / "objects365" / "annotations"
    img_dir.mkdir(parents=True)
    anno_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    # sparse, non-COCO category ids spanning the 365 space
    cat_ids = [7, 42, 118, 250, 365]
    images, annotations = [], []
    aid = 1
    # enough images for one global batch on the 8-device CPU test mesh
    # (MODEL.BATCHSIZE=2 x 8 devices = 16)
    for i in range(1, 21):
        h, w = 96, 128
        cv2.imwrite(
            str(img_dir / f"obj365_{i:012d}.jpg"),
            rng.randint(0, 255, (h, w, 3), np.uint8),
        )
        images.append(dict(id=i, file_name=f"obj365_{i:012d}.jpg", height=h, width=w))
        for _ in range(3):
            bw, bh = int(rng.randint(8, 40)), int(rng.randint(8, 40))
            x, y = int(rng.randint(0, w - bw)), int(rng.randint(0, h - bh))
            annotations.append(
                dict(id=aid, image_id=i, category_id=int(rng.choice(cat_ids)),
                     bbox=[float(x), float(y), float(bw), float(bh)],
                     area=float(bw * bh), iscrowd=0)
            )
            aid += 1
    cats = [dict(id=c, name=f"cat{c}") for c in cat_ids]
    (anno_dir / "objects365_train.json").write_text(
        json.dumps(dict(images=images, annotations=annotations, categories=cats))
    )
    return str(root)


def test_resolve_and_load(o365_root, monkeypatch):
    monkeypatch.setenv("BASEDET_DATA_DIR", o365_root)
    imgs, anno = resolve_dataset("objects365_train")
    assert os.path.isdir(imgs) and os.path.isfile(anno)
    ds = COCODataset(imgs, anno)
    # sparse ids remap to contiguous 1..C
    assert ds.cat_id_to_label == {7: 1, 42: 2, 118: 3, 250: 4, 365: 5}
    assert len(ds) == 20
    rec = ds[0]
    assert rec["boxes"].shape[1] == 4
    assert rec["labels"].min() >= 1 and rec["labels"].max() <= 5


def test_train_dataloader_from_config(o365_root, monkeypatch):
    monkeypatch.setenv("BASEDET_DATA_DIR", o365_root)
    from basedet_tpu.configs import RetinaNetConfig

    cfg = RetinaNetConfig()
    cfg.DATA.TRAIN.name = "objects365_train"
    cfg.DATA.NUM_CLASSES = 365
    cfg.MODEL.BATCHSIZE = 2
    cfg.DATA.MAX_INSTANCES = 8
    cfg.DATA.NUM_WORKERS = 0  # no fork pool inside pytest (jax threads)
    loader = cfg.build_dataloader()
    batch = next(iter(loader))
    # global batch = MODEL.BATCHSIZE x 8 virtual devices (test mesh)
    assert batch["data"].shape[0] == 16
    assert batch["gt_boxes"].shape[1:] == (8, 5)
    assert batch["im_info"].shape == (16, 5)
    labels = batch["gt_boxes"][..., 4]
    assert labels.max() <= 5  # contiguous remap, not raw 365-space ids


def test_undersized_dataset_raises(o365_root, monkeypatch):
    """A dataset smaller than the global batch must fail loudly, not hang
    the prefetch thread (regression: silent busy-loop on empty epochs)."""
    monkeypatch.setenv("BASEDET_DATA_DIR", o365_root)
    from basedet_tpu.configs import RetinaNetConfig

    cfg = RetinaNetConfig()
    cfg.DATA.TRAIN.name = "objects365_train"
    cfg.DATA.NUM_CLASSES = 365
    cfg.MODEL.BATCHSIZE = 64  # global = 64 x 8 devices >> 20 images
    cfg.DATA.NUM_WORKERS = 0
    loader = cfg.build_dataloader()
    with pytest.raises(RuntimeError, match="no batches"):
        next(iter(loader))
