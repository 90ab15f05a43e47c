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
    from flax import linen as nn

    kwargs.setdefault("dtype", compute_dtype())
    # stride-2 convs: dispatch to S2Conv (sub-pixel input gradient — XLA's
    # input-dilated dgrad runs at a fraction of MXU rate; ops/conv_s2.py).
    # Param tree ("kernel"/"bias", HWIO) and forward numerics are identical.
    strides = kwargs.get("strides", args[2] if len(args) > 2 else None)
    # any kwarg outside the set S2Conv forwards (e.g. param_dtype, precision)
    # must defeat the dispatch, not be silently dropped
    _handled = {
        "features", "kernel_size", "strides", "padding", "use_bias",
        "kernel_init", "bias_init", "dtype", "name",
        "feature_group_count", "kernel_dilation", "input_dilation",
    }
    plain = (
        len(args) <= 3  # padding & co. must come as keywords to intercept
        and kwargs.get("feature_group_count", 1) == 1
        and kwargs.get("kernel_dilation") is None
        and kwargs.get("input_dilation") is None
        and all(k in _handled for k in kwargs)
    )
    if strides in (2, (2, 2)) and plain:
        features = args[0] if args else kwargs["features"]
        ksize = args[1] if len(args) > 1 else kwargs["kernel_size"]
        square = (
            isinstance(ksize, (tuple, list)) and len(ksize) == 2
            and ksize[0] == ksize[1]
        )
        # padding must be an explicit symmetric int; flax's default 'SAME'
        # only coincides with 0 for 1x1 kernels
        pad_ok = isinstance(kwargs.get("padding"), int) or (
            square and tuple(ksize) == (1, 1) and "padding" not in kwargs
        )
        from basedet_tpu.ops.conv_s2 import S2Conv, use_subpixel_dgrad

        if square and pad_ok and use_subpixel_dgrad():
            return S2Conv(
                features=features,
                kernel_size=tuple(ksize),
                padding=kwargs.get("padding", 0),
                use_bias=kwargs.get("use_bias", True),
                kernel_init=kwargs.get(
                    "kernel_init", nn.initializers.lecun_normal()
                ),
                bias_init=kwargs.get(
                    "bias_init", nn.initializers.zeros_init()
                ),
                dtype=kwargs.get("dtype"),
                name=kwargs.get("name"),
            )
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
