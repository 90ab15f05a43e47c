"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-device sharding paths are exercised without TPU hardware, per the
framework's test strategy (SURVEY.md §4): the reference had no distributed
tests; here every parallel path is testable on CPU.

Note: this environment pre-sets JAX_PLATFORMS=axon,cpu (TPU via the axon
plugin) before user code runs, so the env var alone is not enough —
jax.config.update after import is authoritative.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeat suite runs skip the expensive XLA:CPU
# compiles (first run still pays them).
from basedet_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
