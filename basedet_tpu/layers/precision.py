"""Compute-dtype policy (TPU mixed precision).

The reference's AMP is CUDA fp16 + GradScaler (solver/default_solver.py:66-76).
On TPU the idiomatic policy is bfloat16 compute with fp32 parameters and fp32
loss math — bf16 shares fp32's exponent range, so no loss scaling is needed.

Modules read the policy at construction (trace) time via ``compute_dtype()``;
the trainer/bench set it from ``cfg.TRAINER.AMP.ENABLE`` before building the
step function. flax layers receive it as their ``dtype`` argument: they cast
inputs/params to bf16 for the matmul/conv while keeping parameter storage and
BatchNorm statistics in fp32.
"""
from __future__ import annotations

from contextlib import contextmanager
from typing import Optional

import jax.numpy as jnp

_COMPUTE_DTYPE = None  # None → full fp32


def set_compute_dtype(dtype) -> None:
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = dtype


def compute_dtype():
    """dtype for flax layers' ``dtype=`` argument (None = no casting)."""
    return _COMPUTE_DTYPE


def configure_from_cfg(cfg) -> None:
    amp = cfg.TRAINER.AMP
    if amp.get("ENABLE", False):
        name = amp.get("DTYPE", "bfloat16")
        set_compute_dtype(jnp.dtype(name))
    else:
        set_compute_dtype(None)


# -- policy-aware layer constructors ------------------------------------------
# Drop-in replacements for nn.Conv / nn.Dense / nn.ConvTranspose that read the
# compute-dtype policy at construction (trace) time.


def Conv(*args, **kwargs):
    # NOTE (round 3): a stride-2 dispatch to a sub-pixel-dgrad custom-VJP
    # conv lived here in round 2 (opt-in, pending measurement). The on-TPU
    # A/B killed it: isolated convs were ~neutral-to-+15% but the full
    # YOLOX-S b128 train step REGRESSED 628->556 img/s (the parity convs
    # defeat XLA's fusion of the surrounding elementwise ops). Measurements
    # in docs/ROADMAP.md (round-3 section).
    from flax import linen as nn

    kwargs.setdefault("dtype", compute_dtype())
    return nn.Conv(*args, **kwargs)


def Dense(*args, **kwargs):
    from flax import linen as nn

    kwargs.setdefault("dtype", compute_dtype())
    return nn.Dense(*args, **kwargs)


def ConvTranspose(*args, **kwargs):
    from flax import linen as nn

    kwargs.setdefault("dtype", compute_dtype())
    return nn.ConvTranspose(*args, **kwargs)


@contextmanager
def precision_policy(dtype):
    prev = compute_dtype()
    set_compute_dtype(dtype)
    try:
        yield
    finally:
        set_compute_dtype(prev)
