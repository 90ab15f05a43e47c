"""Intermediate-feature extraction (reference layers/common/module_inspector.py:19-123
feature_extract ctx manager built on forward hooks). flax equivalent:
``capture_intermediates`` on apply — wrapped here in the same API shape.
"""
from __future__ import annotations

from typing import Callable, Dict, Sequence, Union


def feature_extract(
    module,
    variables,
    *args,
    filter_fn: Union[Sequence[str], Callable] = None,
    **kwargs,
):
    """Run ``module.apply`` capturing intermediate outputs.

    filter_fn: list of module-path substrings to keep, or a callable
    (mdl, method_name) → bool (flax capture_intermediates protocol).
    Returns (outputs, {path: value}).
    """
    if filter_fn is None:
        capture = True
    elif callable(filter_fn):
        capture = filter_fn
    else:
        names = list(filter_fn)

        def capture(mdl, method_name):  # noqa: ANN001
            path = "/".join(str(p) for p in mdl.path)
            return any(n in path for n in names)

    outputs, state = module.apply(
        variables, *args, capture_intermediates=capture,
        mutable=["intermediates"], **kwargs,
    )
    flat: Dict[str, object] = {}

    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{prefix}/{k}" if prefix else str(k))
        else:
            flat[prefix] = tree[0] if isinstance(tree, tuple) else tree

    walk(state.get("intermediates", {}))
    return outputs, flat
