"""Benchmark harness — prints ONE JSON line for the driver.

Primary metric: YOLOX-S training images/sec/chip at 640x640 (bf16 compute)
on synthetic batches — the BASELINE.json north-star config. The reference
publishes no GPU throughput numbers (BASELINE.md), so ``vs_baseline`` is
null; the absolute number is tracked round-over-round in BENCH_r{N}.json.

(Full multi-model sweep: python -m basedet_tpu.tools.benchmark)
"""
from __future__ import annotations

import json
import time


def main():
    import jax

    from basedet_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from basedet_tpu.engine.train_state import TrainState, make_train_step
    from basedet_tpu.parallel import make_mesh, replicate_state, shard_batch
    from basedet_tpu.utils.dummy import DummyLoader
    from basedet_tpu.configs import YOLOXSConfig

    IMG = 640
    # 128 is the single-v5e sweet spot: +18% img/s over 64 (better MXU
    # utilization); 256 exceeds the 16GB HBM
    BATCH = 128
    WARMUP = 5
    ITERS = 15

    cfg = YOLOXSConfig()
    cfg.MODEL.BATCHSIZE = BATCH
    cfg.DATA.MAX_INSTANCES = 50
    cfg.TRAINER.AMP.ENABLE = True
    cfg.TRAINER.EMA.ENABLE = True

    mesh = make_mesh((("data", 1),), devices=jax.devices()[:1])

    model = cfg.build_model()
    solver = cfg.build_solver()
    # build step first: it configures the bf16 policy before module init
    step_fn = jax.jit(make_train_step(model, solver, cfg), donate_argnums=(0,))
    variables = model.init_variables(jax.random.PRNGKey(0), image_size=(IMG, IMG))
    state = replicate_state(TrainState.create(variables, solver, ema=True), mesh)

    loader = DummyLoader(batch_size=BATCH, image_size=(IMG, IMG), max_instances=50)
    batches = [shard_batch(loader.make_batch(i), mesh) for i in range(4)]

    for i in range(WARMUP):
        state, metrics = step_fn(state, batches[i % len(batches)])
    float(metrics["total_loss"])  # scalar readback = true fence (block_until_ready is unreliable over the axon tunnel)

    t0 = time.perf_counter()
    for i in range(ITERS):
        state, metrics = step_fn(state, batches[i % len(batches)])
    float(metrics["total_loss"])  # scalar readback = true fence (block_until_ready is unreliable over the axon tunnel)
    dt = time.perf_counter() - t0

    ips = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": f"yolox_s_train_images_per_sec_per_chip_{IMG}_bf16",
                "value": round(ips, 2),
                "unit": "img/s",
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()
