"""What HBM bandwidth can a Pallas pipeline actually sustain on this v5e,
vs the same op in XLA? Decides whether the fused-BN chain can beat XLA at
all: XLA's dark2 CSP fwd (7.3 ms) is consistent with ~800 GB/s on ~5.8 GB
of traffic, while the fused GEMM micro sustains only ~380 GB/s.

Variants (x: (819200, 256) bf16, distinct per rep, np.asarray fence):
  xla scale        y = x * 1.0001            (pure stream, 800 MB/rep)
  pallas scale     same, TM sweep            (the Pallas pipeline ceiling)
  xla dot          y = x @ w                 (600 MB/rep)
  pallas dot       same, TM sweep
GB/s printed are REAL bytes (read+write) / time.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys
sys.path.insert(0, "/root/repo")
from basedet_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

M, K, N = 819200, 256, 128
REPS, N_TIMED = 8, 5


def timed(tag, prog, *args, bytes_per_rep):
    def fence(o):  # tiny on-device slice -> host transfer (axon fence)
        np.asarray(jax.tree_util.tree_leaves(o)[-1][:1, :1])

    fence(prog(*args))
    t0 = time.perf_counter()
    for _ in range(N_TIMED):
        out = prog(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / N_TIMED / REPS * 1e3
    print(f"{tag:22s} {dt:8.3f} ms   "
          f"{bytes_per_rep/2**30/(dt/1e3):7.1f} GB/s real", flush=True)
    return dt


rng = np.random.RandomState(0)
x0 = jnp.asarray(rng.randn(M, K) * 0.1, jnp.bfloat16)
xs = tuple(x0 + jnp.bfloat16(0.25 * i) for i in range(REPS))
np.asarray(xs[-1][0, :1])
del x0
w = jnp.asarray(rng.randn(K, N) / np.sqrt(K), jnp.bfloat16)


def k_scale(x_ref, y_ref):
    y_ref[...] = x_ref[...] * jnp.bfloat16(1.0001)


def k_dot(x_ref, w_ref, y_ref):
    y_ref[...] = jnp.dot(x_ref[...], w_ref[...],
                         preferred_element_type=jnp.float32
                         ).astype(jnp.bfloat16)


def pallas_scale(tm):
    grid = (M // tm,)
    call = pl.pallas_call(
        k_scale, grid=grid,
        in_specs=[pl.BlockSpec((tm, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tm, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, K), jnp.bfloat16))

    @jax.jit
    def prog(xs):
        return [call(xr) for xr in xs]
    return prog


def pallas_dot(tm):
    grid = (M // tm,)
    call = pl.pallas_call(
        k_dot, grid=grid,
        in_specs=[pl.BlockSpec((tm, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((K, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tm, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16))

    @jax.jit
    def prog(xs, w):
        return [call(xr, w) for xr in xs]
    return prog


@jax.jit
def xla_scale(xs):
    return [xr * jnp.bfloat16(1.0001) for xr in xs]


@jax.jit
def xla_dot(xs, w):
    return [jnp.dot(xr, w, preferred_element_type=jnp.float32
                    ).astype(jnp.bfloat16) for xr in xs]


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    sbytes = 2 * M * K * 2
    dbytes = (M * K + M * N) * 2
    timed("xla scale", xla_scale, xs, bytes_per_rep=sbytes)
    for tm in (512, 2048, 4096):
        timed(f"pallas scale tm{tm}", pallas_scale(tm), xs,
              bytes_per_rep=sbytes)
    timed("xla dot", xla_dot, xs, w, bytes_per_rep=dbytes)
    for tm in (2048, 8192):
        timed(f"pallas dot tm{tm}", pallas_dot(tm), xs, w,
              bytes_per_rep=dbytes)
