"""Generate a REAL pycocotools golden for the in-repo COCOeval.

This sandbox cannot install pycocotools (no network); run this script on any
machine that has it. It writes the deterministic fuzz fixture (the same one
tests/evaluators/test_coco_metrics_fuzz.py cross-validates against the
in-repo transcription) as COCO-format json, runs official pycocotools
COCOeval on it, and dumps the 12 metrics to golden json. Drop the output at
tests/evaluators/data/pycocotools_golden.json and the test suite will assert
equality to 1e-6 automatically (see test_coco_metrics_fuzz_golden.py).

Usage (pycocotools machine):
  python -m basedet_tpu.tools.make_pycocotools_golden --out golden.json

Reference consumer: /root/reference/basedet/evaluators/coco_eval.py:153-172.
"""
from __future__ import annotations

import argparse
import json


def fixture_as_coco(seed: int = 0):
    import sys

    sys.path.insert(0, ".")
    from tests.evaluators.test_coco_metrics_fuzz import make_fixture

    gt_anns, dt_anns, img_ids, cat_ids = make_fixture(seed)
    gt_json = dict(
        images=[dict(id=i, height=640, width=640,
                     file_name=f"{i:012d}.jpg") for i in img_ids],
        annotations=[
            dict(id=n + 1, **a) for n, a in enumerate(gt_anns)
        ],
        categories=[dict(id=c, name=f"cat{c}") for c in cat_ids],
    )
    return gt_json, dt_anns, img_ids, cat_ids


def main(args=None):
    parser = argparse.ArgumentParser("pycocotools golden generator")
    parser.add_argument("--out", default="pycocotools_golden.json")
    parser.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    args = parser.parse_args(args)

    from pycocotools.coco import COCO  # requires the real package
    from pycocotools.cocoeval import COCOeval

    names = ("AP", "AP50", "AP75", "APs", "APm", "APl",
             "AR@1", "AR@10", "AR@100", "ARs", "ARm", "ARl")
    golden = {}
    for seed in args.seeds:
        gt_json, dt_anns, _, _ = fixture_as_coco(seed)
        import tempfile

        with tempfile.NamedTemporaryFile("w", suffix=".json") as f:
            json.dump(gt_json, f)
            f.flush()
            coco = COCO(f.name)
        dt = coco.loadRes(
            [dict(image_id=a["image_id"], category_id=a["category_id"],
                  bbox=a["bbox"], score=a["score"]) for a in dt_anns]
        )
        ev = COCOeval(coco, dt, iouType="bbox")
        ev.evaluate()
        ev.accumulate()
        ev.summarize()
        golden[str(seed)] = dict(zip(names, [float(s) for s in ev.stats]))
    with open(args.out, "w") as f:
        json.dump(golden, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
