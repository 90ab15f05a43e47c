"""2-process jax.distributed smoke test on CPU — the minimal simulation of
the --multi-host path (tools/det_train.py: jax.distributed.initialize), which
the reference covered with dist.launcher (det_train.py:137-139) and round 1
never executed anywhere."""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import jax

# this sandbox pre-sets JAX_PLATFORMS=axon (TPU tunnel) via sitecustomize;
# the config update is the authoritative CPU override (see tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=2,
    process_id=int(sys.argv[2]),
)
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import numpy as np

assert jax.process_count() == 2, jax.process_count()
devs = jax.devices()
assert len(devs) == 2, devs  # one cpu device per process, both visible

mesh = Mesh(np.asarray(devs), ("data",))
# per-host shard (the analogue of per-rank data loading): make_array from
# local shards, then a global psum via jit
local = jnp.full((1, 4), float(jax.process_index() + 1))
global_arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), np.asarray(local), (2, 4)
)
total = jax.jit(lambda x: jnp.sum(x))(global_arr)
# sum over both hosts' shards: 1*4 + 2*4 = 12
assert float(total) == 12.0, float(total)
print("MULTIHOST_OK", jax.process_index(), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_psum(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    addr = f"localhost:{_free_port()}"
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "",  # no virtual device fan-out — 1 device per process
        "JAX_CPU_COLLECTIVES_IMPLEMENTATION": "gloo",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), addr, str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert "MULTIHOST_OK" in out
