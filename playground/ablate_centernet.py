"""Bisect CenterNet's train step at b8 640px (bf16).

  C0: network fwd (res50 res5 -> 3x(DCN+deconv) -> heads)
  C1: + gaussian GT build
  C2: full loss fwd
  C3: full fwd+bwd
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from basedet_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from basedet_tpu.configs import CenterNetConfig
from basedet_tpu.parallel import make_mesh, shard_batch
from basedet_tpu.utils.dummy import DummyLoader

BATCH, IMG, ITERS = 8, 640, 10


def timeit(name, fn, *args):
    out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]  # queued; fence once
    out = outs[-1]
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:26s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    cfg = CenterNetConfig()
    cfg.MODEL.BATCHSIZE = BATCH
    cfg.DATA.MAX_INSTANCES = 50
    cfg.TRAINER.AMP.ENABLE = True

    from basedet_tpu.layers.precision import configure_from_cfg

    configure_from_cfg(cfg)

    mesh = make_mesh((("data", 1),), devices=jax.devices()[:1])
    model = cfg.build_model()
    variables = model.init_variables(jax.random.PRNGKey(0), image_size=(IMG, IMG))
    loader = DummyLoader(batch_size=BATCH, image_size=(IMG, IMG), max_instances=50)
    batch = shard_batch(loader.make_batch(0), mesh)
    module = model.make_module(train=True)

    def net_only(v, b):
        inputs = model.pre_process(b, train=True)
        out, _ = module.apply(v, inputs["image"], mutable=["batch_stats"])
        return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(out))

    timeit("C0 net fwd", jax.jit(net_only), variables, batch)

    def gt_only(v, b):
        inputs = model.pre_process(b, train=True)
        out, _ = module.apply(v, inputs["image"], mutable=["batch_stats"])
        leaves = jax.tree_util.tree_leaves(out)
        hw = leaves[0].shape[1:3]
        gt = jax.vmap(functools.partial(model._gt_single, hw))(
            inputs["gt_boxes"], inputs["img_info"][:, 4].astype(jnp.int32)
        )
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves) + sum(
            jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(gt)
        )

    try:
        timeit("C1 net + GT build", jax.jit(gt_only), variables, batch)
    except Exception as e:
        print("C1 skipped:", type(e).__name__, str(e)[:150])

    def full_loss(v, b):
        total, _, _ = model.get_losses(v, b)
        return total

    timeit("C2 full loss fwd", jax.jit(full_loss), variables, batch)

    def grad_fn(v, b):
        def f(p):
            total, _, _ = model.get_losses({**v, "params": p}, b)
            return total
        return jax.grad(f)(v["params"])

    timeit("C3 full fwd+bwd", jax.jit(grad_fn), variables, batch)


if __name__ == "__main__":
    main()
