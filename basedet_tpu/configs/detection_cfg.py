"""DetectionConfig: the config IS the factory.

Capability analogue of /root/reference/basedet/configs/detection_cfg.py:24-109:
every subsystem (model / dataloader / solver / trainer / evaluator / hooks) is
built from the registry by string name. TPU note: the reference's
``dist.bcast_list_`` parameter broadcast (:80-82) is unnecessary — under
jit/pjit parameters are replicated by sharding construction.
"""
from __future__ import annotations

from basedet_tpu.utils import all_register, logger, registers

from .base_cfg import BaseConfig
from .extra_cfg import (
    DataConfig,
    GlobalConfig,
    ModelConfig,
    SolverConfig,
    TestConfig,
    TrainerConfig,
)


class DetectionConfig(BaseConfig):
    def __init__(self, cfg=None, **kwargs):
        super().__init__()
        self.MODEL = ModelConfig()
        self.DATA = DataConfig()
        self.SOLVER = SolverConfig()
        self.TRAINER = TrainerConfig()
        self.HOOKS = dict(BUILDER_NAME="SimpleHookList")
        self.TEST = TestConfig()
        self.AUG = dict(
            TRAIN_VALUE=(
                (
                    "ShortestEdgeResize",
                    dict(
                        min_size=(640, 672, 704, 736, 768, 800),
                        max_size=1333,
                        sample_style="choice",
                    ),
                ),
                ("RandomHorizontalFlip", dict(prob=0.5)),
            ),
        )
        self.GLOBAL = GlobalConfig()
        if cfg:
            self.merge(cfg)
        if kwargs:
            self.merge(kwargs)

    # -- factories -------------------------------------------------------------
    def build_model(self):
        all_register()
        return registers.models.get(self.MODEL.NAME)(self)

    def build_dataloader(self):
        return registers.dataloader.get(self.DATA.BUILDER_NAME).build(self)

    def build_solver(self):
        return registers.solvers.get(self.SOLVER.BUILDER_NAME).build(self)

    def build_evaluator(self):
        return registers.evaluators.get(self.TEST.EVALUATOR_NAME)(self)

    def build_hooks(self, hooks=None):
        if hooks is None:
            hooks = registers.hooks.get(self.HOOKS.BUILDER_NAME).build(self)
        return hooks

    def build_trainer(self):
        logger.info(f"Using model named {self.MODEL.NAME}")
        model = self.build_model()
        logger.info(f"Using dataloader named {self.DATA.BUILDER_NAME}")
        dataloader = self.build_dataloader()
        logger.info(f"Using solver named {self.SOLVER.BUILDER_NAME}")
        solver = self.build_solver()
        hooks = self.build_hooks()
        trainer_cls = registers.trainers.get(self.TRAINER.NAME)
        return trainer_cls(self, model, dataloader, solver, hooks=hooks)
