"""Smart checkpoint weight matching for pytrees.

Capability analogue of /root/reference/basedet/utils/checkpoint.py:34-150
(load_matched_weights: exact → suffix → shape matching, reshape on equal
size, unused-key warnings; unwarp_ckpt at :31-37).

Here checkpoints are flat dicts of ``path/to/param → np.ndarray`` (pytree
paths joined by '/'); flax variable trees are flattened the same way before
matching.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import numpy as np

from .logger import logger


def unwarp_ckpt(state: Mapping) -> Mapping:
    """Unwrap {model: ...} / {state_dict: ...} nesting."""
    for key in ("model", "state_dict", "params"):
        if key in state and isinstance(state[key], Mapping) and len(state) <= 3:
            inner = state[key]
            if all(not isinstance(v, (int, float, str)) for v in inner.values()):
                return inner
    return state


def flatten_tree(tree: Any, sep: str = "/") -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = sep.join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        flat[key] = leaf
    return flat


def load_matched_weights(
    variables: Any, state: Mapping, strict: bool = False,
    return_stats: bool = False,
):
    """Fill ``variables`` (pytree) from ``state`` (flat name → array).

    Matching order per target leaf: exact path → unique suffix match →
    unique shape match among unused source keys. Arrays whose total size
    matches but shape differs are reshaped (the reference's BN-shape quirk,
    checkpoint.py:79-93).
    """
    state = dict(unwarp_ckpt(state))
    used = set()
    flat_target = flatten_tree(variables)

    def pick(path: str, target_shape):
        if path in state:
            return path
        # suffix match
        suffix_hits = [
            k for k in state
            if k not in used and (k.endswith(path) or path.endswith(k))
        ]
        if len(suffix_hits) == 1:
            return suffix_hits[0]
        shaped = [
            k for k in suffix_hits
            if np.prod(np.shape(state[k])) == int(np.prod(target_shape))
        ]
        if len(shaped) == 1:
            return shaped[0]
        return None

    new_flat = {}
    missing = []
    for path, leaf in flat_target.items():
        src = pick(path, np.shape(leaf))
        if src is None:
            missing.append(path)
            new_flat[path] = leaf
            continue
        arr = np.asarray(state[src])
        if arr.shape != np.shape(leaf):
            if arr.size == np.size(leaf):
                arr = arr.reshape(np.shape(leaf))
            else:
                logger.warning(
                    f"shape mismatch for {path}: ckpt {arr.shape} vs "
                    f"model {np.shape(leaf)}; keeping init"
                )
                missing.append(path)
                new_flat[path] = leaf
                continue
        used.add(src)
        new_flat[path] = arr.astype(np.asarray(leaf).dtype)

    unused = [k for k in state if k not in used]
    if missing:
        msg = f"{len(missing)} params not found in checkpoint, e.g. {missing[:5]}"
        if strict:
            raise KeyError(msg)
        logger.warning(msg)
    if unused:
        logger.warning(
            f"{len(unused)} checkpoint keys unused, e.g. {unused[:5]}"
        )

    # rebuild the pytree in original structure
    leaves_order = list(flat_target.keys())
    treedef = jax.tree_util.tree_structure(variables)
    new_leaves = [new_flat[k] for k in leaves_order]
    tree = jax.tree_util.tree_unflatten(treedef, new_leaves)
    if return_stats:
        return tree, {
            "matched": len(flat_target) - len(missing),
            "missing": missing,
            "unused": unused,
        }
    return tree
