"""Hook-list builders (reference engine/build.py:22-85)."""
from __future__ import annotations

import os

from basedet_tpu.utils import registers

from .hooks import (
    CheckpointHook,
    EvalHook,
    LoggerHook,
    LRSchedulerHook,
    ResumeHook,
    TensorboardHook,
)


@registers.hooks.register()
class SimpleHookList:
    """Default ordered hooks: resume → lr → logger (+TB) → checkpoint → eval
    (reference SimpleHookList.build, engine/build.py:24-44)."""

    @classmethod
    def build(cls, cfg):
        ckpt_dir = cfg.GLOBAL.get("CKPT_SAVE_DIR", "logs/ckpt")
        hooks = [
            ResumeHook(ckpt_dir, enable=cfg.TRAINER.get("RESUME", False)),
            LRSchedulerHook(),
            LoggerHook(log_interval=cfg.GLOBAL.get("LOG_INTERVAL", 20)),
        ]
        if cfg.GLOBAL.TENSORBOARD.get("ENABLE", False):
            hooks.append(
                TensorboardHook(os.path.join(cfg.GLOBAL.OUTPUT_DIR, "tb"))
            )
        hooks.append(CheckpointHook(ckpt_dir))
        hooks.append(EvalHook(cfg.TEST.get("EVAL_EPOCH_INTERVAL", None)))
        return hooks


@registers.hooks.register()
class YOLOXHookList(SimpleHookList):
    """YOLOX hooks: cosine LR lives in the compiled schedule
    (solver/schedules.py yolox_cosine_lr); multiscale sync is handled by the
    dataloader's synced size sampling (reference engine/build.py:48-85 +
    yolo_hooks.py:62-89 — on TPU the size schedule is deterministic from the
    step counter, no broadcast needed)."""

    @classmethod
    def build(cls, cfg):
        return super().build(cfg)
