"""Learning-rate schedules as optax-compatible step → lr functions.

Capability analogue of the reference's MultiStepLR + WarmUpScheduler
(engine/hooks.py:222-248) and YOLOX's quadratic-warmup cosine schedule
(engine/yolo_hooks.py:15-59). TPU-native: the schedule is a pure function of
the global step baked into the compiled update — no host-side hook mutates
the optimizer.
"""
from __future__ import annotations

import math
from typing import Callable, Sequence

import jax.numpy as jnp

from basedet_tpu.utils import registers


@registers.schedulers.register(name="MultiStepLR")
def multistep_lr(
    base_lr: float,
    milestones: Sequence[int],
    gamma: float = 0.1,
    warmup_iters: int = 0,
    warmup_factor: float = 0.001,
) -> Callable:
    """Step decay at iteration ``milestones`` with linear warmup."""
    ms = jnp.asarray(sorted(milestones))

    def schedule(step):
        step = jnp.asarray(step)
        decay = gamma ** jnp.sum(step >= ms)
        lr = base_lr * decay
        if warmup_iters > 0:
            alpha = jnp.clip(step / warmup_iters, 0.0, 1.0)
            warm = warmup_factor * (1 - alpha) + alpha
            lr = lr * jnp.where(step < warmup_iters, warm, 1.0)
        return lr

    return schedule


@registers.schedulers.register(name="CosineLR")
def cosine_lr(
    base_lr: float,
    total_iters: int,
    warmup_iters: int = 0,
    warmup_factor: float = 0.0,
    min_lr_ratio: float = 0.0,
) -> Callable:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        alpha = jnp.clip(step / max(warmup_iters, 1), 0.0, 1.0)
        warm_lr = base_lr * (warmup_factor * (1 - alpha) + alpha)
        progress = jnp.clip(
            (step - warmup_iters) / max(total_iters - warmup_iters, 1), 0.0, 1.0
        )
        min_lr = base_lr * min_lr_ratio
        cos_lr = min_lr + 0.5 * (base_lr - min_lr) * (1 + jnp.cos(math.pi * progress))
        return jnp.where(step < warmup_iters, warm_lr, cos_lr)

    return schedule


@registers.schedulers.register(name="YoloxCosineLR")
def yolox_cosine_lr(
    base_lr: float,
    total_iters: int,
    warmup_iters: int,
    no_aug_iters: int,
    min_lr_ratio: float = 0.05,
) -> Callable:
    """Quadratic warmup → cosine → floor at min_lr for the no-aug tail
    (reference YoloxLRSchedulerHook.get_lr, yolo_hooks.py:35-59)."""
    min_lr = base_lr * min_lr_ratio
    cos_end = total_iters - no_aug_iters

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (jnp.clip(step / max(warmup_iters, 1), 0.0, 1.0) ** 2)
        progress = jnp.clip(
            (step - warmup_iters) / max(cos_end - warmup_iters, 1), 0.0, 1.0
        )
        cos = min_lr + 0.5 * (base_lr - min_lr) * (1 + jnp.cos(math.pi * progress))
        lr = jnp.where(step < warmup_iters, warm, cos)
        return jnp.where(step >= cos_end, min_lr, lr)

    return schedule
