"""Tensor-parallel activation sharding (TPU-native extension).

The reference is data-parallel only (SURVEY.md §2.10); on TPU the natural
extension is a second ``model`` mesh axis for the DETR-family transformer:
activations are constrained to PartitionSpec(..., "model") inside the
attention/FFN blocks and GSPMD splits the matmuls across the axis (weights
stay replicated — these are CNN-scale models where compute, not memory, is
the scaling target; collectives ride ICI).

Model code calls :func:`tp_shard` unconditionally; it is a no-op unless a
trainer/tool has installed a mesh with a ``model`` axis via
:func:`tp_context`, so single-chip and pure-DP paths compile unchanged.
"""
from __future__ import annotations

import contextlib
import threading
from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_state = threading.local()


def current_tp_mesh() -> Optional[Mesh]:
    return getattr(_state, "mesh", None)


def tp_size() -> int:
    mesh = current_tp_mesh()
    return mesh.shape["model"] if mesh is not None else 1


@contextlib.contextmanager
def tp_context(mesh: Optional[Mesh]):
    """Install ``mesh`` (with a ``model`` axis) for tp_shard calls traced
    within the context; pass None / a mesh without a model axis to no-op."""
    use = mesh if mesh is not None and "model" in mesh.axis_names else None
    prev = getattr(_state, "mesh", None)
    _state.mesh = use
    try:
        yield use
    finally:
        _state.mesh = prev


def tp_shard(x: jax.Array, spec: Sequence[Optional[str]]) -> jax.Array:
    """Constrain ``x`` to PartitionSpec(*spec) on the installed TP mesh.

    Axis names in ``spec`` that the mesh lacks are dropped (so
    ("data", None, "model") works on both DP-only and DP x TP meshes).
    """
    mesh = current_tp_mesh()
    if mesh is None:
        return x
    cleaned = tuple(s if s in mesh.axis_names else None for s in spec)
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*cleaned))
    )
