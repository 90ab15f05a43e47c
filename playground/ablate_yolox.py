"""Phase ablation of the YOLOX-S train step on the real chip.

Times, at the bench config (640px, b128, bf16, EMA):
  1. backbone fwd            (CSPDarknet)
  2. backbone+PAFPN+head fwd (network_forward)
  3. full loss fwd           (pre_process + losses, no grad)
  4. grad of the loss        (fwd+bwd)
  5. full train step         (fwd+bwd+optax+EMA)

Each phase is jitted separately; deltas between phases locate the time.
Run: python playground/ablate_yolox.py [BATCH] [IMG]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from basedet_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from basedet_tpu.configs import YOLOXSConfig
from basedet_tpu.engine.train_state import TrainState, make_train_step
from basedet_tpu.parallel import make_mesh, replicate_state, shard_batch
from basedet_tpu.utils.dummy import DummyLoader

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 128
IMG = int(sys.argv[2]) if len(sys.argv) > 2 else 640
WARM, ITERS = 3, 10


def bench(name, fn, *args):
    for _ in range(WARM):
        out = fn(*args)
    jax.block_until_ready(out)
    # scalar readback fence (block_until_ready unreliable over axon tunnel)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:28s} {dt:8.2f} ms   {BATCH / dt * 1e3:8.1f} img/s")
    return dt


def main():
    cfg = YOLOXSConfig()
    cfg.MODEL.BATCHSIZE = BATCH
    cfg.DATA.MAX_INSTANCES = 50
    cfg.TRAINER.AMP.ENABLE = True
    cfg.TRAINER.EMA.ENABLE = True

    mesh = make_mesh((("data", 1),), devices=jax.devices()[:1])
    model = cfg.build_model()
    solver = cfg.build_solver()
    step_fn = jax.jit(make_train_step(model, solver, cfg), donate_argnums=(0,))
    variables = model.init_variables(jax.random.PRNGKey(0), image_size=(IMG, IMG))
    state = replicate_state(TrainState.create(variables, solver, ema=True), mesh)

    loader = DummyLoader(batch_size=BATCH, image_size=(IMG, IMG), max_instances=50)
    batch = shard_batch(loader.make_batch(0), mesh)

    module = model.make_module(train=True)
    img = batch["data"].astype(jnp.float32)

    from basedet_tpu.models.cls.csp_darknet import CSPDarknet

    bb_mod = CSPDarknet(
        depth_factor=cfg.MODEL.DEPTH_FACTOR,
        width_factor=cfg.MODEL.WIDTH_FACTOR,
        act=cfg.MODEL.ACTIVATION,
        train=False,
    )
    bb_vars = jax.jit(bb_mod.init)(jax.random.PRNGKey(0), img[:1])
    bb = jax.jit(lambda v, x: bb_mod.apply(v, x))
    bench("backbone fwd", bb, bb_vars, img)

    net = jax.jit(lambda v, x: module.apply(v, x, mutable=["batch_stats"]))
    bench("network fwd (bn-mutable)", net, variables, img)

    def loss_only(v, b):
        total, metrics, _ = model.get_losses(v, b)
        return total

    try:
        bench("loss fwd", jax.jit(loss_only), variables, batch)
    except Exception as e:
        print("loss fwd skipped:", type(e).__name__, str(e)[:200])

    def grad_fn(v, b):
        def f(p):
            total, metrics, _ = model.get_losses({**v, "params": p}, b)
            return total
        return jax.grad(f)(v["params"])

    try:
        bench("grad (fwd+bwd)", jax.jit(grad_fn), variables, batch)
    except Exception as e:
        print("grad skipped:", type(e).__name__, str(e)[:200])

    # no donation here to allow repeat calls on same state
    for _ in range(WARM):
        state2, metrics = step_fn(state, batch)
        state = state2
    float(metrics["total_loss"])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = step_fn(state, batch)
    float(metrics["total_loss"])
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{'full train step':28s} {dt:8.2f} ms   {BATCH / dt * 1e3:8.1f} img/s")


if __name__ == "__main__":
    main()
