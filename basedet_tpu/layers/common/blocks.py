"""Core conv/norm/activation building blocks (flax.linen, NHWC).

Capability analogue of basecore's ``Conv2d`` / ``get_norm`` /
``get_activation`` wrappers used across the reference layer zoo
(see /root/reference/basedet/layers/__init__.py:3-13). TPU-native choices:
NHWC layout throughout (XLA's preferred conv layout on TPU) and a
``FrozenBatchNorm`` whose statistics AND affine live in the immutable
``frozen`` variable collection, so freezing is structural rather than an
optimizer-masking convention.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn
from basedet_tpu.layers.precision import Conv

ModuleDef = Any


class FrozenBatchNorm(nn.Module):
    """BatchNorm with all state frozen (reference 'FrozenBN' semantics:
    ImageNet-pretrained statistics applied as a fixed affine transform)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.variable(
            "frozen", "scale", lambda: jnp.ones((c,), jnp.float32)
        ).value
        bias = self.variable(
            "frozen", "bias", lambda: jnp.zeros((c,), jnp.float32)
        ).value
        mean = self.variable(
            "frozen", "mean", lambda: jnp.zeros((c,), jnp.float32)
        ).value
        var = self.variable(
            "frozen", "var", lambda: jnp.ones((c,), jnp.float32)
        ).value
        mul = (scale * jax.lax.rsqrt(var + self.epsilon)).astype(x.dtype)
        add = (bias - mean * scale * jax.lax.rsqrt(var + self.epsilon)).astype(x.dtype)
        return x * mul + add


def get_norm(
    name: Optional[str],
    train: bool = False,
    axis_name: Optional[str] = None,
    eps: float = 1e-5,
    momentum: float = 0.9,
):
    """Return a norm-layer constructor by name (basecore get_norm analogue).

    "SyncBN" performs cross-replica statistics via ``axis_name`` (the
    TPU-native analogue of MegEngine SyncBatchNorm over NCCL). ``eps`` /
    ``momentum`` allow per-model BN hyperparams (YOLOX uses 1e-3 / 0.97,
    reference yolox.py:35-36).
    """
    from basedet_tpu.layers.precision import compute_dtype

    if name is None or name == "":
        return None
    if name in ("BN", "SyncBN"):
        return lambda: nn.BatchNorm(
            use_running_average=not train,
            momentum=momentum,
            epsilon=eps,
            axis_name=axis_name if name == "SyncBN" else None,
            dtype=compute_dtype(),  # stats & params stay fp32
        )
    if name == "FrozenBN":
        return lambda: FrozenBatchNorm()
    if name == "GN":
        return lambda: nn.GroupNorm(
            num_groups=32, epsilon=1e-5, dtype=compute_dtype()
        )
    raise ValueError(f"unknown norm {name!r}")


_ACTIVATIONS: dict = {
    "relu": jax.nn.relu,
    "lrelu": lambda x: jax.nn.leaky_relu(x, 0.1),
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, 0.1),
    "silu": jax.nn.silu,
    "sigmoid": jax.nn.sigmoid,
    "gelu": jax.nn.gelu,
    "identity": lambda x: x,
}


def get_activation(name: Optional[Union[str, Callable]]):
    if name is None:
        return lambda x: x
    if callable(name):
        return name
    return _ACTIVATIONS[name]


def msra_normal(fan_mode: str = "fan_in"):
    """He-normal init matching MegEngine msra_normal_ (reference FPN init,
    fpn_backbone.py:78-79)."""
    return nn.initializers.variance_scaling(2.0, fan_mode, "normal")


def msra_uniform(fan_mode: str = "fan_in"):
    return nn.initializers.variance_scaling(2.0, fan_mode, "uniform")


class ConvBnAct(nn.Module):
    """Conv2d + optional norm + optional activation (basecore Conv2d analogue)."""

    out_channels: int
    ksize: Union[int, Sequence[int]] = 3
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    bias: bool = True
    norm: Optional[str] = None
    act: Optional[Union[str, Callable]] = None
    train: bool = False
    axis_name: Optional[str] = None
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()
    padding: Optional[Union[str, int]] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = (
            (self.ksize, self.ksize)
            if isinstance(self.ksize, int)
            else tuple(self.ksize)
        )
        if self.padding is None:
            pad = ((k[0] - 1) // 2 * self.dilation, (k[1] - 1) // 2 * self.dilation)
            padding = [(pad[0], pad[0]), (pad[1], pad[1])]
        elif isinstance(self.padding, int):
            padding = [(self.padding, self.padding)] * 2
        else:
            padding = self.padding
        use_bias = self.bias and self.norm is None
        x = Conv(
            features=self.out_channels,
            kernel_size=k,
            strides=(self.stride, self.stride),
            padding=padding,
            feature_group_count=self.groups,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=use_bias,
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
            name="conv",
        )(x)
        norm_ctor = get_norm(self.norm, train=self.train, axis_name=self.axis_name)
        if norm_ctor is not None:
            x = norm_ctor()(x)
        return get_activation(self.act)(x)
