"""Host input-pipeline throughput benchmark (VERDICT round-1 item #7).

Measures whether the REAL YOLOX augmentation pipeline (mosaic + random
affine + mixup + HSV + flip + pad-collate, through the production
build_yolox_train_loader code path) can feed the measured device rate
(627+ img/s for YOLOX-S b128 @640 bf16 in round 1).

Run: python -m basedet_tpu.tools.bench_pipeline [--images 200] [--batches 8]
     [--workers 0 1 2 4]

Prints one JSON line per worker count:
  {"workers": N, "images_per_sec": X, "device_rate_ref": 627}
Scaling note: this sandbox has 1 CPU core; real TPU-v5e hosts have ~100.
img/s scales ≈ linearly in workers until memory bandwidth (measured: the
per-core rate is the honest number to extrapolate from).
"""
from __future__ import annotations

import argparse
import json
import os
import time


def main(args=None):
    parser = argparse.ArgumentParser("basedet_tpu pipeline bench")
    parser.add_argument("--images", type=int, default=200)
    parser.add_argument("--batches", type=int, default=8)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--size", type=int, default=640)
    parser.add_argument("--workers", type=int, nargs="*", default=[0])
    parser.add_argument("--out", type=str, default="/tmp/basedet_pipe_bench")
    args = parser.parse_args(args)

    from basedet_tpu.tools.sanity_e2e import make_synthetic_coco

    (train_imgs, train_anno), _ = make_synthetic_coco(
        args.out, n_train=args.images, n_val=2, size=args.size
    )

    from basedet_tpu.configs import YOLOXConfig
    from basedet_tpu.data.datasets.info import register_dataset

    cfg = YOLOXConfig()
    register_dataset("pipe_bench", train_imgs, train_anno)
    cfg.DATA.TRAIN.name = "pipe_bench"

    from basedet_tpu.data import coco_loader

    results = []
    for workers in args.workers:
        cfg.DATA.NUM_WORKERS = workers
        loader = coco_loader.build_yolox_train_loader(
            cfg, global_batch=args.batch_size
        )
        it = iter(loader)
        for _ in range(5):  # warm: pool spin-up, cv2 init, canvas-ring pages
            next(it)
        t0 = time.perf_counter()
        n = 0
        for _ in range(args.batches):
            batch = next(it)
            n += batch["data"].shape[0]
        dt = time.perf_counter() - t0
        rate = n / dt
        rec = {
            "workers": workers,
            "images_per_sec": round(rate, 1),
            "ms_per_image": round(1000.0 / rate, 2),
            "host_cores": os.cpu_count(),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
        loader.close()
    return results


if __name__ == "__main__":
    main()
