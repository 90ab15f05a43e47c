"""Benchmark harness — prints ONE JSON line for the driver.

Metric: training images/sec/chip at 640x640 on the flagship detector
(capability analogue of reference tools/benchmark.py:114-272, with
block_until_ready fences replacing mge._full_sync()).

The reference publishes no throughput numbers (BASELINE.md), so
``vs_baseline`` is reported against the driver's YOLOX-s north-star target
once YOLOX lands; until then it is null.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax

    from basedet_tpu.engine.train_state import TrainState, make_train_step
    from basedet_tpu.parallel import make_mesh, replicate_state, shard_batch
    from basedet_tpu.utils.dummy import DummyLoader
    from basedet_tpu.configs import RetinaNetConfig

    IMG = 640
    BATCH = 8
    WARMUP = 5
    ITERS = 20

    cfg = RetinaNetConfig()
    cfg.MODEL.BATCHSIZE = BATCH
    cfg.DATA.MAX_INSTANCES = 32
    cfg.SOLVER.NUM_IMAGE_PER_EPOCH = 80000
    cfg.TRAINER.EMA.ENABLE = True

    n_dev = 1  # single-chip benchmark
    mesh = make_mesh((("data", n_dev),), devices=jax.devices()[:n_dev])

    model = cfg.build_model()
    solver = cfg.build_solver()
    variables = model.init_variables(jax.random.PRNGKey(0), image_size=(IMG, IMG))
    state = replicate_state(
        TrainState.create(variables, solver, ema=True), mesh
    )
    step_fn = jax.jit(make_train_step(model, solver, cfg), donate_argnums=(0,))

    loader = DummyLoader(batch_size=BATCH, image_size=(IMG, IMG), max_instances=32)
    batches = [shard_batch(loader.make_batch(i), mesh) for i in range(4)]

    for i in range(WARMUP):
        state, metrics = step_fn(state, batches[i % len(batches)])
    jax.block_until_ready(metrics["total_loss"])

    t0 = time.perf_counter()
    for i in range(ITERS):
        state, metrics = step_fn(state, batches[i % len(batches)])
    jax.block_until_ready(metrics["total_loss"])
    dt = time.perf_counter() - t0

    ips = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": f"retinanet_r50_train_images_per_sec_per_chip_{IMG}",
                "value": round(ips, 2),
                "unit": "img/s",
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()
