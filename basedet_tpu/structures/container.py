"""Container of parallel per-detection arrays.

Capability analogue of /root/reference/basedet/structures/container.py:5-16.
Registered as a JAX pytree so it can flow through jit/vmap. Fancy indexing
applies to every field simultaneously.
"""
from __future__ import annotations

import jax


class Container(dict):
    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    def index(self, idx) -> "Container":
        """Apply the same index to every field."""
        return Container({k: v[idx] for k, v in self.items()})


def _flatten(c: Container):
    keys = sorted(c.keys())
    return [c[k] for k in keys], tuple(keys)


def _unflatten(keys, values):
    return Container(zip(keys, values))


jax.tree_util.register_pytree_node(Container, _flatten, _unflatten)
