"""Profiling CLI (reference tools/profile_net.py:20-165): wraps train iters
in a profiler trace. TPU version uses jax.profiler (XPlane/perfetto trace
viewable in TensorBoard or xprof)."""
from __future__ import annotations

import os

import jax

from basedet_tpu.utils import all_register, logger, setup_logger

from .misc import apply_common_flags, default_parser, import_config


def profile_training(cfg, trace_dir: str, n_iters: int = 5):
    from basedet_tpu.engine.train_state import TrainState, make_train_step
    from basedet_tpu.parallel import make_mesh, replicate_state, shard_batch
    from basedet_tpu.utils.dummy import DummyLoader

    model = cfg.build_model()
    solver = cfg.build_solver()
    mesh = make_mesh()
    size = tuple(cfg.DATA.get("DUMMY_IMAGE_SIZE", (640, 640)))
    variables = model.init_variables(jax.random.PRNGKey(0), image_size=size)
    state = replicate_state(
        TrainState.create(variables, solver, ema=False), mesh
    )
    step_fn = jax.jit(make_train_step(model, solver, cfg), donate_argnums=(0,))
    loader = DummyLoader(
        batch_size=cfg.MODEL.BATCHSIZE * mesh.devices.size, image_size=size,
        max_instances=cfg.DATA.get("MAX_INSTANCES", 32),
    )
    batch = shard_batch(loader.make_batch(), mesh)
    # warmup/compile outside the trace
    state, metrics = step_fn(state, batch)
    float(metrics["total_loss"])  # scalar readback = true fence (block_until_ready is unreliable over the axon tunnel)

    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        for _ in range(n_iters):
            state, metrics = step_fn(state, batch)
        float(metrics["total_loss"])  # scalar readback = true fence (block_until_ready is unreliable over the axon tunnel)
    logger.info(f"wrote profiler trace to {trace_dir} (open with xprof/TensorBoard)")


def main(args=None):
    parser = default_parser("basedet_tpu profile")
    parser.add_argument("--trace-dir", type=str, default="logs/profile")
    parser.add_argument("--iters", type=int, default=5)
    args = parser.parse_args(args)
    all_register()
    cfg = import_config(args.file)
    apply_common_flags(cfg, args)
    setup_logger(cfg.GLOBAL.OUTPUT_DIR, file_prefix="profile_log")
    profile_training(cfg, args.trace_dir, args.iters)


if __name__ == "__main__":
    main()
