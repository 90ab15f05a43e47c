"""Isolate YOLOX-S loss-path costs inside single jitted programs.

A: network fwd (BN mutable), reduce outputs       -> T_net
B: full get_losses                                -> T_loss  (B-A = assignment+losses)
C: get_losses with SimOTA skipped (fixed masks)   -> T_loss_noOTA (B-C = SimOTA)
"""
from __future__ import annotations

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

BATCH, IMG, ITERS = 128, 640, 10


def timeit(name, fn, *args):
    out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]  # queued; fence once
    out = outs[-1]
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:34s} {dt:8.2f} ms")
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
    step_fn = jax.jit(make_train_step(model, solver, cfg))  # configures bf16
    variables = model.init_variables(jax.random.PRNGKey(0), image_size=(IMG, IMG))
    loader = DummyLoader(batch_size=BATCH, image_size=(IMG, IMG), max_instances=50)
    batch = shard_batch(loader.make_batch(0), mesh)

    module = model.make_module(train=True)

    def net_only(v, b):
        inputs = model.pre_process(b, train=True)
        (lg, of, ob), _ = module.apply(v, inputs["image"], mutable=["batch_stats"])
        s = sum(jnp.sum(x.astype(jnp.float32)) for x in lg + of + ob)
        return s

    t_net = timeit("A net fwd (BN mutable)", jax.jit(net_only), variables, batch)

    def full_loss(v, b):
        total, _, _ = model.get_losses(v, b)
        return total

    t_loss = timeit("B full loss fwd", jax.jit(full_loss), variables, batch)

    # C: monkeypatch _assign_single to a cheap fixed assignment
    orig = model._assign_single

    def cheap_assign(anchors, strides_vec, gt, num_valid, pred_xcycwh, cls_logits, obj_logits):
        R = anchors.shape[0]
        fg = (jnp.arange(R) % 100) == 0
        matched = jnp.zeros((R,), jnp.int32)
        pred_iou = jnp.full((R,), 0.5, jnp.float32)
        return fg, matched, pred_iou

    model._assign_single = cheap_assign
    t_noota = timeit("C loss fwd, SimOTA stubbed", jax.jit(full_loss), variables, batch)
    model._assign_single = orig

    print(f"assignment+losses (B-A): {t_loss - t_net:7.2f} ms")
    print(f"SimOTA alone      (B-C): {t_loss - t_noota:7.2f} ms")

    # D: full train step for reference
    state = replicate_state(TrainState.create(variables, solver, ema=True), mesh)

    def step(s, b):
        return step_fn(s, b)

    out = step(state, batch)
    float(out[1]["total_loss"])
    t0 = time.perf_counter()
    s = state
    for _ in range(ITERS):
        s, m = step(s, batch)
    float(m["total_loss"])
    print(f"{'D full train step':34s} {(time.perf_counter()-t0)/ITERS*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
