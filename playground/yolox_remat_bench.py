"""YOLOX-S train throughput vs (batch, remat policy).

Round-1 found b128 is the HBM ceiling (b160 OOM, no remat) — does selective
remat unlock b160/192 and does the extra recompute pay for itself?

usage: python playground/yolox_remat_bench.py [batch remat]*
  e.g. python playground/yolox_remat_bench.py 160 selective 192 selective
"""
import sys
import time

import jax
import numpy as np

from basedet_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from basedet_tpu.configs import YOLOXSConfig
from basedet_tpu.engine.train_state import TrainState, make_train_step
from basedet_tpu.parallel import make_mesh, replicate_state, shard_batch
from basedet_tpu.utils.dummy import DummyLoader

IMG, WARMUP, ITERS = 640, 5, 10


def bench(batch: int, remat: str):
    cfg = YOLOXSConfig()
    cfg.MODEL.BATCHSIZE = batch
    cfg.DATA.MAX_INSTANCES = 50
    cfg.TRAINER.AMP.ENABLE = True
    cfg.TRAINER.EMA.ENABLE = True
    if remat != "none":
        cfg.TRAINER.REMAT = remat

    try:
        mesh = make_mesh((("data", 1),), devices=jax.devices()[:1])
        model = cfg.build_model()
        solver = cfg.build_solver()
        step_fn = jax.jit(make_train_step(model, solver, cfg),
                          donate_argnums=(0,))
        variables = model.init_variables(
            jax.random.PRNGKey(0), image_size=(IMG, IMG))
        state = replicate_state(
            TrainState.create(variables, solver, ema=True), mesh)
        loader = DummyLoader(batch_size=batch, image_size=(IMG, IMG),
                             max_instances=50)
        batches = [shard_batch(loader.make_batch(i), mesh) for i in range(4)]

        t0 = time.perf_counter()
        for i in range(WARMUP):
            state, metrics = step_fn(state, batches[i % 4])
        float(metrics["total_loss"])  # scalar readback = axon-safe fence
        warm = time.perf_counter() - t0

        t0 = time.perf_counter()
        for i in range(ITERS):
            state, metrics = step_fn(state, batches[i % 4])
        float(metrics["total_loss"])
        dt = (time.perf_counter() - t0) / ITERS
        print(f"b{batch} remat={remat}: {batch / dt:8.1f} img/s "
              f"({dt * 1e3:.1f} ms/step, warmup {warm:.0f}s)", flush=True)
    except Exception as e:
        print(f"b{batch} remat={remat}: FAILED {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    args = sys.argv[1:] or ["160", "selective", "192", "selective"]
    for b, r in zip(args[::2], args[1::2]):
        bench(int(b), r)
