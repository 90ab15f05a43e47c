"""Decompose YOLOX-S backward cost at b128 640 bf16.

  G0: grad of sum(net outputs), train-mode BN (batch stats computed)
  G1: grad of sum(net outputs), eval-mode BN (running stats — no stat math)
  G0-G1 ≈ train-BN stats cost (fwd+bwd); G0 vs full step locates the rest.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from basedet_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from basedet_tpu.configs import YOLOXSConfig
from basedet_tpu.parallel import make_mesh, shard_batch
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
    print(f"{name:34s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    cfg = YOLOXSConfig()
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
    img = model.pre_process(batch, train=True)["image"]

    train_mod = model.make_module(train=True)
    eval_mod = model.make_module(train=False)

    def g_train(v, x):
        def f(p):
            out, _ = train_mod.apply(
                {**v, "params": p}, x, mutable=["batch_stats"]
            )
            return sum(
                jnp.sum(o.astype(jnp.float32)) for o in jax.tree_util.tree_leaves(out)
            )
        return jax.grad(f)(v["params"])

    def g_eval(v, x):
        def f(p):
            out = eval_mod.apply({**v, "params": p}, x)
            return sum(
                jnp.sum(o.astype(jnp.float32)) for o in jax.tree_util.tree_leaves(out)
            )
        return jax.grad(f)(v["params"])

    timeit("G0 fwd+bwd, train BN", jax.jit(g_train), variables, img)
    timeit("G1 fwd+bwd, eval BN", jax.jit(g_eval), variables, img)


if __name__ == "__main__":
    main()
