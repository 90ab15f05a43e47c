"""Training hooks.

Capability analogue of /root/reference/basedet/engine/hooks.py:26-402
(BaseHook phases + LoggerHook / LRSchedulerHook / EvalHook / CheckpointHook /
ResumeHook / TensorboardHook). Hooks run host-side between jitted steps; LR
scheduling itself is compiled into the step (solver/schedules.py), so the LR
hook only logs.
"""
from __future__ import annotations

import datetime
import os
import pickle
import time
from typing import Optional

import numpy as np

from basedet_tpu.utils import logger, registers


class BaseHook:
    trainer = None  # set by the trainer

    def before_train(self):
        pass

    def after_train(self):
        pass

    def before_epoch(self):
        pass

    def after_epoch(self):
        pass

    def before_iter(self):
        pass

    def after_iter(self):
        pass


@registers.hooks.register()
class LoggerHook(BaseHook):
    """Per-interval loss/lr/time/ETA logging (reference hooks.py:36-195)."""

    def __init__(self, log_interval: int = 20):
        self.log_interval = log_interval
        self.start_time = None

    def before_train(self):
        self.start_time = time.time()
        t = self.trainer
        logger.info(f"Starting training: {t.progress.max_epoch} epochs x "
                    f"{t.progress.max_iter} iters, "
                    f"world size {t.world_size}, "
                    f"global batch {t.global_batch_size}")

    def after_iter(self):
        t = self.trainer
        p = t.progress
        if p.current_iter % self.log_interval != 0:
            return
        # pull metrics (device sync point)
        meters = t.meters
        done = p.current_iter
        total = p.total_iter
        elapsed = time.time() - self.start_time
        eta = datetime.timedelta(
            seconds=int(elapsed / max(done, 1) * (total - done))
        )
        loss_str = ", ".join(
            f"{k}: {m.avg:.4f}"
            for k, m in meters.items()
            if "loss" in k
        )
        extra = ", ".join(
            f"{k}: {m.avg:.4g}"
            for k, m in meters.items()
            if "loss" not in k and "time" not in k
        )
        time_str = ", ".join(
            f"{k}: {m.avg * 1000:.0f}ms"
            for k, m in meters.items()
            if "time" in k
        )
        logger.info(
            f"{', '.join(p.progress_str_list())}, {loss_str}, {extra}, "
            f"{time_str}, ETA: {eta}"
        )


@registers.hooks.register()
class LRSchedulerHook(BaseHook):
    """LR is part of the compiled step; this hook exists for parity and
    records the current LR into the meters (reference hooks.py:198-248)."""

    def after_iter(self):
        pass  # lr already tracked via train-step metrics


@registers.hooks.register()
class CheckpointHook(BaseHook):
    """Save latest.pkl + per-epoch checkpoints with model/optimizer/
    progress/EMA (reference hooks.py:296-325)."""

    def __init__(self, save_dir: str, save_period: int = 1):
        self.save_dir = save_dir
        self.save_period = save_period

    def _save(self, name: str):
        t = self.trainer
        os.makedirs(self.save_dir, exist_ok=True)
        path = os.path.join(self.save_dir, name)
        payload = {
            "state": jax_to_numpy(t.state),
            "progress": t.progress.state_dict(),
        }
        with open(path, "wb") as f:
            pickle.dump(payload, f)
        with open(os.path.join(self.save_dir, "last_checkpoint"), "w") as f:
            f.write(name)
        logger.info(f"saved checkpoint to {path}")

    def after_epoch(self):
        self._save("latest.pkl")
        if self.trainer.progress.epoch % self.save_period == 0:
            self._save(f"epoch_{self.trainer.progress.epoch}.pkl")

    def after_train(self):
        t = self.trainer
        os.makedirs(self.save_dir, exist_ok=True)
        weights = jax_to_numpy(
            t.state.variables(ema=t.ema_enabled)
        )
        with open(os.path.join(self.save_dir, "dumped_model.pkl"), "wb") as f:
            pickle.dump({"model": weights}, f)


@registers.hooks.register()
class ResumeHook(BaseHook):
    """Load latest checkpoint, restore state + progress
    (reference hooks.py:328-360)."""

    def __init__(self, save_dir: str, enable: bool = True):
        self.save_dir = save_dir
        self.enable = enable

    def before_train(self):
        if not self.enable:
            return
        pointer = os.path.join(self.save_dir, "last_checkpoint")
        if not os.path.exists(pointer):
            logger.info("no checkpoint found; training from scratch")
            return
        with open(pointer) as f:
            name = f.read().strip()
        path = os.path.join(self.save_dir, name)
        with open(path, "rb") as f:
            payload = pickle.load(f)
        t = self.trainer
        t.state = numpy_to_state_like(t.state, payload["state"])
        # re-place the restored host arrays on the trainer's mesh (replicated
        # like init_state does) — otherwise the first jitted step sees
        # uncommitted numpy leaves and placement is left to jit defaults,
        # which under a sharded mesh is not guaranteed to match the compiled
        # step's expectations
        mesh = getattr(t, "mesh", None)
        if mesh is not None:
            from basedet_tpu.parallel import replicate_state

            t.state = replicate_state(t.state, mesh)
        t.progress.load_state_dict(payload["progress"])
        t.progress.epoch_done()  # resume at next epoch (reference :345)
        logger.info(f"resumed from {path} at epoch {t.progress.epoch}")


@registers.hooks.register()
class OrbaxCheckpointHook(BaseHook):
    """Async (preemption-safe) checkpointing via orbax — the TPU-idiomatic
    upgrade over pickle snapshots (SURVEY.md §5: the reference has
    checkpoint-resume only; orbax async writes overlap training and survive
    preemptions). Enabled with GLOBAL.CKPT_BACKEND = "orbax"."""

    def __init__(self, save_dir: str, max_to_keep: int = 3):
        self.save_dir = os.path.abspath(save_dir)
        self.max_to_keep = max_to_keep
        self._mngr = None

    @property
    def mngr(self):
        if self._mngr is None:
            import orbax.checkpoint as ocp

            self._mngr = ocp.CheckpointManager(
                self.save_dir,
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=self.max_to_keep,
                    enable_async_checkpointing=True,
                ),
            )
        return self._mngr

    def before_train(self):
        t = self.trainer
        if not t.cfg.TRAINER.get("RESUME", False):
            return
        import orbax.checkpoint as ocp

        step = self.mngr.latest_step()
        if step is None:
            logger.info("orbax: no checkpoint found; training from scratch")
            return
        t.state = self.mngr.restore(
            step, args=ocp.args.StandardRestore(t.state)
        )
        t.progress.epoch = step + 1
        logger.info(f"orbax: resumed from step {step}")

    def after_epoch(self):
        import orbax.checkpoint as ocp

        t = self.trainer
        self.mngr.save(
            t.progress.epoch, args=ocp.args.StandardSave(t.state)
        )

    def after_train(self):
        if self._mngr is not None:
            self._mngr.wait_until_finished()


@registers.hooks.register()
class EvalHook(BaseHook):
    """Mid-train + final evaluation, including the EMA weights
    (reference hooks.py:251-293)."""

    def __init__(self, eval_interval: Optional[int] = None):
        self.eval_interval = eval_interval

    def _run_eval(self, use_ema: bool):
        t = self.trainer
        if t.evaluator is None or t.test_dataloader is None:
            logger.info("EvalHook: no evaluator/test dataloader wired; skipping")
            return
        variables = t.state.variables(ema=use_ema)
        results = t.evaluator.evaluate_model(t.model, variables, t.test_dataloader)
        tag = "EMA" if use_ema else "model"
        logger.info(f"eval ({tag}): {results}")

    def after_epoch(self):
        p = self.trainer.progress
        if self.eval_interval and p.epoch % self.eval_interval == 0 \
                and not p.is_last_epoch():
            self._run_eval(use_ema=False)

    def after_train(self):
        self._run_eval(use_ema=False)
        if self.trainer.ema_enabled:
            self._run_eval(use_ema=True)


@registers.hooks.register()
class TensorboardHook(BaseHook):
    """Scalar writer (reference hooks.py:363-402); uses tensorboardX."""

    def __init__(self, log_dir: str, write_interval: int = 20):
        self.log_dir = log_dir
        self.write_interval = write_interval
        self.writer = None

    def before_train(self):
        from tensorboardX import SummaryWriter

        os.makedirs(self.log_dir, exist_ok=True)
        self.writer = SummaryWriter(self.log_dir)

    def after_iter(self):
        t = self.trainer
        step = t.progress.current_iter
        if step % self.write_interval != 0 or self.writer is None:
            return
        for k, m in t.meters.items():
            self.writer.add_scalar(k, m.latest, step)

    def after_train(self):
        if self.writer is not None:
            self.writer.close()


@registers.hooks.register()
class TBDetectionImageHook(BaseHook):
    """Per-epoch TensorBoard images of the model's current detections on the
    last training batch (extension beyond the reference, which only wrote
    scalars — hooks.py:363-402; rendering via visualize_detection,
    coco_eval.py:24-68). Enable with GLOBAL.TENSORBOARD.LOG_IMAGES."""

    def __init__(self, log_dir: str, max_images: int = 2,
                 score_threshold: float = 0.3):
        self.log_dir = log_dir
        self.max_images = max_images
        self.score_threshold = score_threshold
        self.writer = None

    def before_train(self):
        from tensorboardX import SummaryWriter

        os.makedirs(self.log_dir, exist_ok=True)
        self.writer = SummaryWriter(self.log_dir)

    def after_epoch(self):
        import numpy as np

        from basedet_tpu.evaluators.visualize import visualize_detection

        t = self.trainer
        batch = getattr(t, "last_batch", None)
        if batch is None or self.writer is None:
            return
        n = min(self.max_images, int(np.asarray(batch["data"]).shape[0]))
        small = {
            k: np.asarray(v)[:n]
            for k, v in batch.items()
            if hasattr(v, "shape") and np.asarray(v).ndim >= 1
        }
        dets = t.model.inference(t.state.variables(), small)
        boxes = np.asarray(dets["boxes"])
        scores = np.asarray(dets["box_scores"])
        labels = np.asarray(dets["box_labels"])
        valid = np.asarray(dets.get("valid", scores > 0))
        step = t.progress.current_iter
        for b in range(n):
            img = np.asarray(small["data"][b])
            if img.dtype != np.uint8:
                img = np.clip(img, 0, 255).astype(np.uint8)
            keep = valid[b].astype(bool)
            rows = np.concatenate(
                [boxes[b][keep], scores[b][keep, None], labels[b][keep, None]],
                axis=1,
            )
            # detections are in original-image coords; the canvas is the
            # padded training image — rescale back onto it
            info = small["im_info"][b]
            if info[2] > 0 and info[3] > 0:
                s = [info[1] / info[3], info[0] / info[2]]
                rows[:, :4] *= np.asarray([s[0], s[1], s[0], s[1]])
            rendered = visualize_detection(
                img, rows, score_threshold=self.score_threshold
            )
            self.writer.add_image(
                f"detections/img{b}", rendered[..., ::-1], step,
                dataformats="HWC",
            )

    def after_train(self):
        if self.writer is not None:
            self.writer.close()


def jax_to_numpy(tree):
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def numpy_to_state_like(like, tree):
    import jax

    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    leaves = jax.tree_util.tree_leaves(tree)
    assert len(leaves) == len(leaves_like), "checkpoint/state structure mismatch"
    return jax.tree_util.tree_unflatten(treedef, leaves)
