"""Device-mesh + sharding helpers (the distributed layer).

Capability analogue of the reference's megengine.distributed usage (§2.10 of
SURVEY.md): NCCL launcher/allreduce/broadcast become a jax.sharding.Mesh with
pjit auto-collectives over ICI. Data parallelism = batch sharded on the
``data`` axis, state replicated; the same helpers accept extra model axes for
tensor-parallel extensions.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axes: Sequence[Tuple[str, int]] = None, devices=None
) -> Mesh:
    """Build a mesh; default is a 1-D data-parallel mesh over all devices."""
    devices = devices if devices is not None else jax.devices()
    if axes is None:
        axes = (("data", len(devices)),)
    names = [a[0] for a in axes]
    sizes = [a[1] for a in axes]
    assert int(np.prod(sizes)) == len(devices), (
        f"mesh {sizes} does not cover {len(devices)} devices"
    )
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, axis_names=names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(batch: Dict, mesh: Mesh, axis: str = "data") -> Dict:
    """Place a host batch dict onto the mesh, sharded along the leading
    (batch) dimension (the analogue of per-rank data loading)."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batch
    )


def replicate_state(state, mesh: Mesh):
    return jax.device_put(state, replicated(mesh))


def local_world_size() -> int:
    return jax.device_count()
