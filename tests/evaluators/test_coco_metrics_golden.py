"""Assert the in-repo COCOeval against a REAL pycocotools golden, when one
has been generated (tools/make_pycocotools_golden.py on a machine with
pycocotools) and dropped at tests/evaluators/data/pycocotools_golden.json.
Skipped until then — the fuzz cross-validation in test_coco_metrics_fuzz.py
is the offline grounding."""
import json
import os

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "data",
                      "pycocotools_golden.json")


@pytest.mark.skipif(not os.path.exists(GOLDEN),
                    reason="no pycocotools golden generated yet")
def test_against_pycocotools_golden():
    from basedet_tpu.evaluators.coco_metrics import evaluate_coco_map
    from tests.evaluators.test_coco_metrics_fuzz import (
        make_fixture,
        to_by_img_cat,
    )

    with open(GOLDEN) as f:
        golden = json.load(f)
    for seed_str, expected in golden.items():
        gt_anns, dt_anns, img_ids, cat_ids = make_fixture(int(seed_str))
        got = evaluate_coco_map(
            to_by_img_cat(gt_anns), to_by_img_cat(dt_anns), img_ids, cat_ids
        )
        for k, v in expected.items():
            assert got[k] == pytest.approx(v, abs=1e-6), (seed_str, k)
