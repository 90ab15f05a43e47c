"""Name → object registries.

Capability analogue of the reference registry system
(/root/reference/basedet/utils/registry.py:12-73): a set of named ``Registry``
instances (models, solvers, dataloaders, ...) that the config-as-factory layer
looks up by string name. ``all_register()`` imports every sub-package once so
that registration decorators have executed before any ``registers.X.get``.
"""
from __future__ import annotations

import importlib
import threading
from typing import Any, Callable, Dict, Optional


class Registry:
    def __init__(self, name: str):
        self._name = name
        self._map: Dict[str, Any] = {}

    @property
    def name(self) -> str:
        return self._name

    def register(self, obj: Optional[Any] = None, name: Optional[str] = None,
                 overwrite: bool = False):
        """Use as ``@reg.register()`` decorator or ``reg.register(obj)``.
        ``overwrite=True`` allows idempotent re-registration (tools/tests)."""
        if obj is None:
            def deco(o, _name=name):
                self._do_register(_name or o.__name__, o, overwrite)
                return o
            return deco
        self._do_register(name or obj.__name__, obj, overwrite)
        return obj

    def _do_register(self, name: str, obj: Any, overwrite: bool = False) -> None:
        if not overwrite and name in self._map and self._map[name] is not obj:
            raise KeyError(f"{name!r} already registered in registry {self._name!r}")
        self._map[name] = obj

    def get(self, name: str) -> Any:
        if name not in self._map:
            raise KeyError(
                f"{name!r} not found in registry {self._name!r}; "
                f"known: {sorted(self._map)}"
            )
        return self._map[name]

    def __contains__(self, name: str) -> bool:
        return name in self._map

    def keys(self):
        return self._map.keys()

    def items(self):
        return self._map.items()


class _Registers:
    """Namespace of all framework registries (mirrors reference naming,
    including its 'evalutors' alias kept for config compatibility)."""

    def __init__(self):
        self.models = Registry("models")
        self.trainers = Registry("trainers")
        self.hooks = Registry("hooks")
        self.solvers = Registry("solvers")
        self.dataloader = Registry("dataloader")
        self.datasets = Registry("datasets")
        self.datasets_info = Registry("datasets_info")
        self.transforms = Registry("transforms")
        self.evaluators = Registry("evaluators")
        self.losses = Registry("losses")
        self.schedulers = Registry("schedulers")

    # reference spells it "evalutors" (utils/registry.py:22); accept both.
    @property
    def evalutors(self):
        return self.evaluators


registers = _Registers()

_ALL_REGISTERED = False
_LOCK = threading.Lock()

# Modules whose import triggers registration decorators.
_REGISTRATION_MODULES = (
    "basedet_tpu.models",
    "basedet_tpu.solver",
    "basedet_tpu.engine",
    "basedet_tpu.data",
    "basedet_tpu.evaluators",
)


def all_register() -> None:
    """Import every registering sub-package exactly once
    (reference: utils/registry.py:53-73)."""
    global _ALL_REGISTERED
    with _LOCK:
        if _ALL_REGISTERED:
            return
        for mod in _REGISTRATION_MODULES:
            importlib.import_module(mod)
        _ALL_REGISTERED = True
