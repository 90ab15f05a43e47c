"""Persistent XLA compilation cache.

TPU detection graphs take O(minutes) to compile (more over remote-compile
tunnels); enabling JAX's persistent cache makes every repeated
shape/config combination load in seconds across processes — the analogue of
the reference's cuDNN fastrun algo cache (tools/det_train.py:94-96), but for
whole programs. Enabled by default under $BASEDET_CACHE_DIR/xla (override
with $JAX_COMPILATION_CACHE_DIR, disable with BASEDET_NO_COMPILE_CACHE=1).
"""
from __future__ import annotations

import os

_ENABLED = False


def enable_compilation_cache() -> None:
    global _ENABLED
    if _ENABLED or os.environ.get("BASEDET_NO_COMPILE_CACHE"):
        return
    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(
            os.environ.get(
                "BASEDET_CACHE_DIR", os.path.expanduser("~/.cache/basedet_tpu")
            ),
            "xla",
        ),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _ENABLED = True
