"""Training CLI (reference tools/det_train.py:18-150).

TPU-native differences: no dist.launcher process fan-out — one process
drives all local devices through pjit; multi-host runs call
``jax.distributed.initialize`` (automatic under standard TPU runtimes).
"""
from __future__ import annotations

from basedet_tpu.utils import all_register, logger, setup_logger

from .misc import apply_common_flags, default_parser, import_config


def _train_one(config_file: str, args):
    cfg = import_config(config_file)
    apply_common_flags(cfg, args)

    setup_logger(cfg.GLOBAL.OUTPUT_DIR)
    cfg.link_log_dir()
    logger.info(f"training config: {config_file}")

    trainer = cfg.build_trainer()
    trainer.init_state()
    trainer.train()
    return trainer


def main(args=None):
    parser = default_parser("basedet_tpu train")
    parser.add_argument(
        "--multi-host", action="store_true",
        help="initialize jax.distributed for multi-host TPU slices "
             "(the analogue of the reference's dist.launcher; single-host "
             "runs need nothing)",
    )
    parser.add_argument(
        "-d", "--dir", type=str, default=None,
        help="train every *.py config in this directory sequentially "
             "(reference det_train.py:24,143-148 multi-config mode)",
    )
    args = parser.parse_args(args)
    if getattr(args, "multi_host", False):
        import jax

        jax.distributed.initialize()
    all_register()

    if args.dir:
        import os

        trainer = None
        for name in sorted(os.listdir(args.dir)):
            if name.endswith(".py"):
                trainer = _train_one(os.path.join(args.dir, name), args)
        return trainer
    return _train_one(args.file, args)


if __name__ == "__main__":
    main()
