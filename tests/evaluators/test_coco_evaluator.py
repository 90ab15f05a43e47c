"""COCOEvaluator round-trip: feeding the ground truth back as detections
must score AP = 1.0; shifted boxes must score lower."""
import numpy as np
import pytest

from basedet_tpu.utils import ConfigDict


class FakeDataset:
    """Minimal COCODataset protocol: .items + label maps."""

    def __init__(self):
        rng = np.random.RandomState(0)
        self.items = []
        for i in range(4):
            n = rng.randint(1, 4)
            x = rng.uniform(0, 80, n)
            y = rng.uniform(0, 80, n)
            w = rng.uniform(20, 60, n)
            h = rng.uniform(20, 60, n)
            self.items.append(
                dict(
                    id=i + 1,
                    boxes=np.stack([x, y, x + w, y + h], axis=1).astype(np.float32),
                    labels=rng.randint(1, 4, n).astype(np.int32),
                    iscrowd=np.zeros(n, np.int32),
                )
            )
        self.label_to_cat_id = {1: 1, 2: 5, 3: 7}


def _evaluator():
    from basedet_tpu.evaluators import COCOEvaluator

    cfg = ConfigDict(GLOBAL=dict(OUTPUT_DIR="/tmp/bd_eval_test"))
    return COCOEvaluator(cfg)


def _records_from_gt(ds, jitter=0.0, score=0.9):
    recs = []
    rng = np.random.RandomState(1)
    for item in ds.items:
        for box, label in zip(item["boxes"], item["labels"]):
            b = box + rng.uniform(-jitter, jitter, 4)
            recs.append(
                dict(
                    image_id=item["id"],
                    category_id=ds.label_to_cat_id[int(label)],
                    bbox=[
                        float(b[0]), float(b[1]),
                        float(b[2] - b[0]), float(b[3] - b[1]),
                    ],
                    score=score,
                )
            )
    return recs


def test_gt_as_predictions_scores_ap1():
    ds = FakeDataset()
    ev = _evaluator()
    results = ev.evaluate_records(_records_from_gt(ds), ds)
    assert results["AP"] == pytest.approx(1.0)
    assert results["AP50"] == pytest.approx(1.0)


def test_jittered_predictions_score_lower():
    ds = FakeDataset()
    ev = _evaluator()
    perfect = ev.evaluate_records(_records_from_gt(ds), ds)["AP"]
    noisy = ev.evaluate_records(_records_from_gt(ds, jitter=10.0), ds)["AP"]
    assert noisy < perfect


def test_detections_to_records_masks_invalid():
    from basedet_tpu.evaluators import COCOEvaluator

    dets = {
        "boxes": np.asarray([[[0, 0, 10, 10], [5, 5, 20, 20]]], np.float32),
        "box_scores": np.asarray([[0.9, 0.8]], np.float32),
        "box_labels": np.asarray([[0, 2]], np.int32),
        "valid": np.asarray([[True, False]]),
    }
    recs = COCOEvaluator.detections_to_records(dets, [42], {1: 1, 3: 7})
    assert len(recs) == 1
    assert recs[0]["image_id"] == 42
    assert recs[0]["category_id"] == 1  # label 0 → class 1 → cat id 1
    assert recs[0]["bbox"] == [0.0, 0.0, 10.0, 10.0]
