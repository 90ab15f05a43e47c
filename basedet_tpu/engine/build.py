"""Hook-list builders (reference engine/build.py:22-85)."""
from __future__ import annotations

import os

from basedet_tpu.utils import registers

from .hooks import (
    BaseHook,
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
        from .hooks import OrbaxCheckpointHook

        ckpt_dir = cfg.GLOBAL.get("CKPT_SAVE_DIR", "logs/ckpt")
        use_orbax = cfg.GLOBAL.get("CKPT_BACKEND", "pickle") == "orbax"
        hooks = []
        if not use_orbax:
            hooks.append(
                ResumeHook(ckpt_dir, enable=cfg.TRAINER.get("RESUME", False))
            )
        hooks += [
            LRSchedulerHook(),
            LoggerHook(log_interval=cfg.GLOBAL.get("LOG_INTERVAL", 20)),
        ]
        if cfg.GLOBAL.TENSORBOARD.get("ENABLE", False):
            tb_dir = os.path.join(cfg.GLOBAL.OUTPUT_DIR, "tb")
            hooks.append(TensorboardHook(tb_dir))
            if cfg.GLOBAL.TENSORBOARD.get("LOG_IMAGES", False):
                from .hooks import TBDetectionImageHook

                hooks.append(TBDetectionImageHook(tb_dir))
        hooks.append(
            OrbaxCheckpointHook(ckpt_dir) if use_orbax
            else CheckpointHook(ckpt_dir)
        )
        hooks.append(EvalHook(cfg.TEST.get("EVAL_EPOCH_INTERVAL", None)))
        return hooks


class YoloxNoAugHook(BaseHook):
    """Enter the no-aug phase for the last NO_AUG_EPOCH epochs: disable
    mosaic/mixup and enable the L1 loss term, re-jitting the step
    (reference YOLOXHookList + use_l1 toggling, engine/build.py:50-85)."""

    def before_epoch(self):
        t = self.trainer
        setting = t.cfg.AUG.get("TRAIN_SETTING", {})
        no_aug = setting.get("NO_AUG_EPOCH", 0)
        if not no_aug:
            return
        in_no_aug = t.progress.epoch > t.progress.max_epoch - no_aug
        if in_no_aug and not getattr(t.model, "use_l1", False):
            t.model.use_l1 = True
            mosaic_ds = getattr(t.dataloader, "mosaic_dataset", None)
            if mosaic_ds is not None:
                mosaic_ds.enable_mosaic = False
                mosaic_ds.enable_mixup = False
                # worker pools snapshot the dataset at fork; re-fork so the
                # flag flip actually reaches NUM_WORKERS>0 loaders
                mapped = getattr(t.dataloader, "mapped_loader", None)
                if mapped is not None:
                    mapped.request_pool_restart()
            t.rebuild_train_step()


@registers.hooks.register()
class YOLOXHookList(SimpleHookList):
    """YOLOX hooks (reference engine/build.py:48-85): cosine LR lives in the
    compiled schedule (solver/schedules.py yolox_cosine_lr); multiscale sync
    is a deterministic function of the step (models/det/yolox.py
    target_size_for_step — no broadcast needed); the no-aug switch is a
    hook."""

    @classmethod
    def build(cls, cfg):
        return super().build(cfg) + [YoloxNoAugHook()]
