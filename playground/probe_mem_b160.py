"""YOLOX HBM breakdown by (batch, remat policy) — compile-only, no OOM risk.

VERDICT r2 weak #7 / next #5: b160 OOMs even with selective remat; get
EVIDENCE of the binding allocation instead of more blind remat tries.
``jit(...).lower(...).compile().memory_analysis()`` prices the program
without running it; for configs that fail to compile with RESOURCE_EXHAUSTED
the error text itself carries the top allocations — both are captured.

usage: python playground/probe_mem_b160.py [batch remat]*
"""
import sys

import jax
import numpy as np

from basedet_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from basedet_tpu.configs import YOLOXSConfig
from basedet_tpu.engine.train_state import TrainState, make_train_step
from basedet_tpu.parallel import make_mesh, replicate_state, shard_batch
from basedet_tpu.utils.dummy import DummyLoader

IMG = 640


def probe(batch: int, remat: str):
    cfg = YOLOXSConfig()
    cfg.MODEL.BATCHSIZE = batch
    cfg.DATA.MAX_INSTANCES = 50
    cfg.TRAINER.AMP.ENABLE = True
    cfg.TRAINER.EMA.ENABLE = True
    if remat != "none":
        cfg.TRAINER.REMAT = remat

    mesh = make_mesh((("data", 1),), devices=jax.devices()[:1])
    model = cfg.build_model()
    solver = cfg.build_solver()
    step = jax.jit(make_train_step(model, solver, cfg), donate_argnums=(0,))
    variables = model.init_variables(
        jax.random.PRNGKey(0), image_size=(IMG, IMG))
    state = replicate_state(TrainState.create(variables, solver, ema=True),
                            mesh)
    loader = DummyLoader(batch_size=batch, image_size=(IMG, IMG),
                         max_instances=50)
    b = shard_batch(loader.make_batch(0), mesh)
    try:
        compiled = step.lower(state, b).compile()
        ma = compiled.memory_analysis()
        gb = 1 / (1024 ** 3)
        print(
            f"b{batch} remat={remat}: temp {ma.temp_size_in_bytes*gb:.2f} G "
            f"args {ma.argument_size_in_bytes*gb:.2f} G "
            f"out {ma.output_size_in_bytes*gb:.2f} G "
            f"alias {ma.alias_size_in_bytes*gb:.2f} G "
            f"peak(temp+args-alias) "
            f"{(ma.temp_size_in_bytes + ma.argument_size_in_bytes - ma.alias_size_in_bytes)*gb:.2f} G",
            flush=True,
        )
    except Exception as e:
        msg = str(e)
        print(f"b{batch} remat={remat}: COMPILE FAIL {type(e).__name__}",
              flush=True)
        # keep the XLA top-allocation table, drop the HLO noise
        keep = []
        for ln in msg.splitlines():
            if any(t in ln for t in (
                    "Used", "hbm", "Size:", "Shape:", "XLA label",
                    "Operator:", "utilization", "fragmentation")):
                keep.append(ln.strip())
        print("\n".join(keep[:80]), flush=True)


if __name__ == "__main__":
    args = sys.argv[1:] or [
        "128", "none", "160", "none", "160", "selective", "192", "selective",
    ]
    for b, r in zip(args[::2], args[1::2]):
        probe(int(b), r)
