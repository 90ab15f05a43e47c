"""Loader→device composition probe (VERDICT r3 #6): run the REAL YOLOX
mosaic/mixup/affine loader together with the real jitted YOLOX-S train step
on the TPU and measure the composed throughput vs the synthetic-fed device
rate (benchmark.json / bench.py feed 4 pre-built DummyLoader batches).

What it records, per step: host wait for `next(loader)` (prefetch hides it
only if the workers keep up), device step dispatch, and the end-to-end
composed img/s. This box has ONE host core, so the expectation is
host-bound composition; the number that matters is the per-batch host
latency distribution, which sets the worker count a real TPU VM host
(~100 cores) needs to saturate the device step (~projection printed).

Reference producer being replaced: basedet/data/build.py:196-227.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import numpy as np  # noqa: E402

from basedet_tpu.utils import all_register  # noqa: E402
from basedet_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

all_register()
enable_compilation_cache()

STEPS = 30
BATCH = 8
SIZE = 640


def main():
    from basedet_tpu import configs as C
    from basedet_tpu.data.coco_loader import build_yolox_train_loader
    from basedet_tpu.data.datasets.info import register_dataset
    from basedet_tpu.engine.train_state import TrainState, make_train_step
    from basedet_tpu.parallel import make_mesh, replicate_state, shard_batch
    from basedet_tpu.tools.sanity_e2e import make_synthetic_coco

    (train_imgs, train_anno), _ = make_synthetic_coco(
        "/tmp/loader_compose", n_train=200, n_val=4, size=SIZE
    )
    register_dataset("compose_train", train_imgs, train_anno)

    cfg = C.YOLOXSConfig()
    cfg.MODEL.BATCHSIZE = BATCH
    cfg.DATA.TRAIN.name = "compose_train"
    s = cfg.AUG.TRAIN_SETTING
    s.INPUT_SIZE = (SIZE, SIZE)
    s.MULTISCALE_RANGE = (SIZE // 32, SIZE // 32)  # one compiled step
    cfg.DATA.NUM_CLASSES = 3
    cfg.DATA.MAX_INSTANCES = 8

    model = cfg.build_model()
    solver = cfg.build_solver()
    mesh = make_mesh((("data", 1),), devices=jax.devices()[:1])
    variables = model.init_variables(
        jax.random.PRNGKey(0), image_size=(SIZE, SIZE)
    )
    state = replicate_state(
        TrainState.create(variables, solver, ema=True), mesh
    )
    step_fn = jax.jit(make_train_step(model, solver, cfg), donate_argnums=(0,))

    loader = build_yolox_train_loader(cfg, global_batch=BATCH)
    it = iter(loader)
    batch_mapper = getattr(model, "train_batch_mapper", None)

    host_ms, total_t0 = [], None
    for step in range(STEPS):
        t0 = time.perf_counter()
        batch = dict(next(it))
        batch.pop("image_id", None)
        if batch_mapper is not None:
            batch = batch_mapper(batch, step)
        batch = shard_batch(batch, mesh)
        t1 = time.perf_counter()
        state, metrics = step_fn(state, batch)
        if step == 0:
            # fence compile; start the composed-throughput clock after it
            float(np.asarray(metrics["total_loss"]))
            total_t0 = time.perf_counter()
        else:
            host_ms.append((t1 - t0) * 1e3)
    loss = float(np.asarray(metrics["total_loss"]))  # fences the tail
    total_s = time.perf_counter() - total_t0
    n = STEPS - 1
    composed = n * BATCH / total_s
    h = np.asarray(host_ms)
    print(f"composed loader+device: {composed:.1f} img/s "
          f"({total_s / n * 1e3:.1f} ms/step, b{BATCH}@{SIZE}, "
          f"final loss {loss:.3f})")
    print(f"host next(batch) ms: p50 {np.percentile(h, 50):.0f} "
          f"p90 {np.percentile(h, 90):.0f} max {h.max():.0f} "
          f"(prefetch-hidden when 0-ish)")
    # synthetic-fed device rate for the same config (benchmark.json r4
    # sweep: YOLOX-S train b8 amp = 431 img/s, 18.55 ms/step)
    dev_ms = 18.55
    p50 = float(np.percentile(h, 50))
    if p50 > 0.5:
        workers = max(1.0, p50 / dev_ms)
        print(f"overlap math: host p50 {p50:.0f} ms vs device {dev_ms} ms "
              f"-> ~{workers:.0f} workers to hide the host on a real "
              f"TPU-VM host (this box: 1 core)")
    try:
        loader.close()
    except Exception:
        pass


if __name__ == "__main__":
    main()
