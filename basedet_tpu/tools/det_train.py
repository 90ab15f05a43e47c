"""Training CLI (reference tools/det_train.py:18-150).

TPU-native differences: no dist.launcher process fan-out — one process
drives all local devices through pjit; multi-host runs call
``jax.distributed.initialize`` (automatic under standard TPU runtimes).
"""
from __future__ import annotations

from basedet_tpu.utils import all_register, logger, setup_logger

from .misc import apply_common_flags, default_parser, import_config


def main(args=None):
    parser = default_parser("basedet_tpu train")
    parser.add_argument(
        "--multi-host", action="store_true",
        help="initialize jax.distributed for multi-host TPU slices "
             "(the analogue of the reference's dist.launcher; single-host "
             "runs need nothing)",
    )
    args = parser.parse_args(args)
    if getattr(args, "multi_host", False):
        import jax

        jax.distributed.initialize()
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
