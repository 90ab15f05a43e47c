"""Input pre-processing: pad-to-multiple + normalization (NHWC).

Capability analogue of /root/reference/basedet/layers/common/pre_processing.py:11-49
(data_to_input / get_padded_tensor / get_multiple_size). On TPU the batch
arrives already padded to a static size bucket by the collator; this module
provides the same ops for single-image / eager paths and the normalize step
used inside the jitted forward.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp


def get_multiple_size(input_size: int, multiple: int = 32) -> int:
    return (input_size + multiple - 1) // multiple * multiple


def get_padded_tensor(
    x: jnp.ndarray, multiple_number: int = 32, pad_value: float = 0.0
) -> jnp.ndarray:
    """Pad H and W (dims -3, -2 of an NHWC tensor) up to multiples."""
    h, w = x.shape[-3], x.shape[-2]
    ph = get_multiple_size(h, multiple_number)
    pw = get_multiple_size(w, multiple_number)
    if ph == h and pw == w:
        return x
    pad = [(0, 0)] * (x.ndim - 3) + [(0, ph - h), (0, pw - w), (0, 0)]
    return jnp.pad(x, pad, constant_values=pad_value)


def normalize_image(
    image: jnp.ndarray,
    mean: Optional[Sequence[float]] = None,
    std: Optional[Sequence[float]] = None,
) -> jnp.ndarray:
    """(x - mean) / std over the channel (last) axis."""
    image = image.astype(jnp.float32)
    if mean is not None:
        image = image - jnp.asarray(mean, jnp.float32)
    if std is not None:
        image = image / jnp.asarray(std, jnp.float32)
    return image


def data_to_input(
    image: jnp.ndarray,
    mean: Optional[Sequence[float]] = None,
    std: Optional[Sequence[float]] = None,
    multiple: int = 32,
) -> jnp.ndarray:
    """Pad to x``multiple`` and normalize (reference data_to_input)."""
    return normalize_image(get_padded_tensor(image, multiple), mean, std)
