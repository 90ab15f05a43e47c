"""Deployment export CLI (reference tools/trace_net.py:53-98 + BaseNet.
dump_static_graph, models/base_net.py:94-114): serializes the jitted
inference graph via jax.export (StableHLO) for serving."""
from __future__ import annotations

import jax

from basedet_tpu.utils import all_register, logger, setup_logger

from .misc import apply_common_flags, default_parser, import_config


def main(args=None):
    parser = default_parser("basedet_tpu trace/export")
    parser.add_argument("--out", type=str, default="model.stablehlo")
    parser.add_argument("--height", type=int, default=640)
    parser.add_argument("--width", type=int, default=640)
    args = parser.parse_args(args)
    all_register()
    cfg = import_config(args.file)
    apply_common_flags(cfg, args)
    setup_logger(cfg.GLOBAL.OUTPUT_DIR, file_prefix="trace_log")

    model = cfg.build_model()
    variables = model.init_variables(
        jax.random.PRNGKey(0), image_size=(args.height, args.width)
    )
    if args.weights:
        variables = model.load_weights(variables, args.weights)
    model.dump_static_graph(
        variables, args.out, image_size=(args.height, args.width)
    )
    logger.info(f"exported to {args.out}")


if __name__ == "__main__":
    main()
