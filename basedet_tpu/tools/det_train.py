"""Training CLI (reference tools/det_train.py:18-150).

TPU-native differences: no dist.launcher process fan-out — one process
drives all local devices through pjit; multi-host runs call
``jax.distributed.initialize`` (automatic under standard TPU runtimes).
"""
from __future__ import annotations

import os

from basedet_tpu.utils import all_register, logger, setup_logger

from .misc import apply_common_flags, default_parser, import_config


def main(args=None):
    parser = default_parser("basedet_tpu train")
    args = parser.parse_args(args)
    all_register()
    cfg = import_config(args.file)
    apply_common_flags(cfg, args)

    setup_logger(cfg.GLOBAL.OUTPUT_DIR)
    cfg.link_log_dir()
    logger.info(f"training config: {args.file}")

    trainer = cfg.build_trainer()
    trainer.init_state()
    trainer.train()
    return trainer


if __name__ == "__main__":
    main()
