"""Model analysis CLI (reference tools/analyze_net.py:74-115): parameter
counts + compiled-graph FLOPs via XLA cost analysis."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from basedet_tpu.utils import all_register, logger, setup_logger

from .misc import apply_common_flags, default_parser, import_config


def analyze(cfg, image_size=(640, 640)):
    model = cfg.build_model()
    variables = model.init_variables(jax.random.PRNGKey(0), image_size=image_size)
    n_params = sum(
        x.size for x in jax.tree_util.tree_leaves(variables.get("params", {}))
    )
    module = model.make_module(train=False)

    def fwd(image):
        return module.apply(variables, image)

    x = jnp.zeros((1, *image_size, 3), jnp.float32)
    lowered = jax.jit(fwd).lower(x)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    flops = cost.get("flops", float("nan")) if cost else float("nan")
    stats = {
        "model": cfg.MODEL.NAME,
        "params_M": round(n_params / 1e6, 3),
        "forward_gflops": round(flops / 1e9, 2) if np.isfinite(flops) else None,
        "image_size": image_size,
    }
    logger.info(f"analysis: {stats}")
    return stats


def main(args=None):
    parser = default_parser("basedet_tpu analyze")
    parser.add_argument("--height", type=int, default=640)
    parser.add_argument("--width", type=int, default=640)
    args = parser.parse_args(args)
    all_register()
    cfg = import_config(args.file)
    apply_common_flags(cfg, args)
    setup_logger()
    return analyze(cfg, (args.height, args.width))


if __name__ == "__main__":
    main()
