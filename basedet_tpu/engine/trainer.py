"""DetTrainer: the host-side training loop around the compiled step.

Capability analogue of /root/reference/basedet/engine/trainer.py:16-108 and
basecore's BaseTrainer epoch/iter loop. The per-iter device work
(forward/loss/grad/allreduce/update/EMA) is ONE jitted function
(engine/train_state.py); this class owns data feeding, hook phases, meters
and timing. The reference's ``mge._full_sync()`` fence (trainer.py:83)
becomes an explicit block_until_ready at metric-read points only.
"""
from __future__ import annotations

import time
from typing import Iterable, List, Optional

import jax
import numpy as np

from basedet_tpu.engine.progress import Progress
from basedet_tpu.engine.train_state import TrainState, make_train_step
from basedet_tpu.parallel import make_mesh, replicate_state, shard_batch, tp_context
from basedet_tpu.utils import MeterBuffer, logger, registers


@registers.trainers.register()
class DetTrainer:
    def __init__(self, cfg, model, dataloader, solver, hooks: List = ()):
        from basedet_tpu.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()
        self.cfg = cfg
        self.model = model
        self.dataloader = dataloader
        self.solver = solver
        self.meters = MeterBuffer(window_size=cfg.GLOBAL.get("LOG_INTERVAL", 20))

        # optional tensor-parallel axis (TPU-native extension; the
        # reference is DP-only, SURVEY §2.10): TRAINER.TP_SIZE splits the
        # device pool into a (data, model) mesh and transformer blocks
        # shard their activations over "model" (parallel/tp.py)
        tp = int(cfg.TRAINER.get("TP_SIZE", 1))
        n_dev = len(jax.devices())
        if tp > 1:
            assert n_dev % tp == 0, f"TP_SIZE {tp} does not divide {n_dev}"
            self.mesh = make_mesh((("data", n_dev // tp), ("model", tp)))
        else:
            self.mesh = make_mesh()
        self.world_size = self.mesh.shape.get("data", self.mesh.devices.size)
        self.global_batch_size = cfg.MODEL.BATCHSIZE * self.world_size

        max_iter = max(
            1,
            int(
                cfg.SOLVER.NUM_IMAGE_PER_EPOCH
                / self.world_size
                / cfg.MODEL.BATCHSIZE
            ),
        )
        self.progress = Progress(
            max_epoch=cfg.SOLVER.MAX_EPOCH, max_iter=max_iter
        )

        self.ema_enabled = bool(cfg.TRAINER.EMA.get("ENABLE", False))
        self.rebuild_train_step()
        # models may map batches per step (e.g. YOLOX multiscale resize)
        self.batch_mapper = getattr(model, "train_batch_mapper", None)

        self.state: Optional[TrainState] = None
        # eval wiring (lazy — EvalHook triggers it; reference hooks.py:286-293)
        self.evaluator = None
        self.test_dataloader = None
        if cfg.TEST.get("EVAL_EPOCH_INTERVAL", None) or cfg.DATA.TEST.get(
            "name", "dummy"
        ) != "dummy":
            try:
                self.evaluator = cfg.build_evaluator()
                from basedet_tpu.data.build import build_test_dataloader

                self.test_dataloader = build_test_dataloader(cfg)
            except Exception as e:  # missing dataset on disk etc.
                logger.warning(f"eval wiring skipped: {e}")

        self.hooks = list(hooks)
        for h in self.hooks:
            h.trainer = self

    # -- lifecycle ---------------------------------------------------------------
    def init_state(self, rng=None, image_size=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if image_size is None:
            image_size = tuple(
                self.cfg.DATA.get("DUMMY_IMAGE_SIZE", (512, 512))
            )
        variables = self.model.init_variables(rng, image_size=image_size)
        weights = self.cfg.MODEL.get("WEIGHTS", None)
        if weights:
            logger.info(f"loading pretrained weights from {weights}")
            variables = self.model.load_weights(variables, weights)
        state = TrainState.create(variables, self.solver, ema=self.ema_enabled)
        self.state = replicate_state(state, self.mesh)

    def train(self):
        with tp_context(self.mesh):
            self._train_impl()

    def _train_impl(self):
        if self.state is None:
            self.init_state()
        data_iter = iter(self.dataloader)

        self._call_hooks("before_train")
        start_epoch = self.progress.epoch
        for epoch in range(start_epoch, self.progress.max_epoch + 1):
            self.progress.epoch = epoch
            self._call_hooks("before_epoch")
            for it in range(1, self.progress.max_iter + 1):
                self.progress.inner_iter = it
                self._call_hooks("before_iter")
                self.train_one_iter(data_iter)
                self._call_hooks("after_iter")
            self._call_hooks("after_epoch")
            if epoch < self.progress.max_epoch:
                self.progress.epoch_done()
        self._call_hooks("after_train")
        logger.info("training finished")

    def rebuild_train_step(self):
        """(Re-)jit the step; called at init and when the loss graph changes
        (e.g. YOLOX no-aug phase enabling the L1 term)."""
        self._train_step = jax.jit(
            make_train_step(self.model, self.solver, self.cfg),
            donate_argnums=(0,),
        )

    def train_one_iter(self, data_iter):
        t0 = time.perf_counter()
        batch = dict(next(data_iter))
        batch.pop("image_id", None)
        if self.batch_mapper is not None:
            batch = self.batch_mapper(batch, self.progress.current_iter)
        batch = shard_batch(dict(batch), self.mesh)
        self.last_batch = batch  # hooks (e.g. TB image logging) may inspect
        t1 = time.perf_counter()
        self.state, metrics = self._train_step(self.state, batch)
        # Steps dispatch asynchronously; materializing metrics is the sync
        # fence, so only pay it at the logging cadence (the reference paid
        # mge._full_sync() EVERY iter, trainer.py:83 — here the device queue
        # stays full between log points).
        log_interval = self.cfg.GLOBAL.get("LOG_INTERVAL", 20)
        if self.progress.current_iter % log_interval == 0:
            metrics = {k: float(np.asarray(v)) for k, v in metrics.items()}
            t2 = time.perf_counter()
            last = getattr(self, "_last_fence", None)
            self._last_fence = t2
            if last is not None:
                self.meters.update(
                    train_time=(t2 - last) / log_interval
                )
            self.meters.update(metrics)
            # model-pushed host-side metrics (reference BaseNet.extra_meter,
            # e.g. YOLOX's current img_size — models/det/yolox.py:256)
            extra = getattr(self.model, "extra_meter", None)
            if extra:
                self.meters.update(extra)
        self.meters.update(data_time=t1 - t0)

    def _call_hooks(self, phase: str):
        for h in self.hooks:
            getattr(h, phase)()
