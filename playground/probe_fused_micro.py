"""Micro A/B: ONE fused GEMM+stats Pallas call vs its XLA equivalent.

Isolates the kernel cost from the chain glue. Shapes are the lane-packed
dark2 conv1: x (819200, 256) bf16 @ w (256, 128).

METHODOLOGY (v2): the first version perturbed x per rep with `x + r`
inside the jit — XLA fuses that add into its own dot but must MATERIALIZE
it before a pallas_call (an extra 800 MB round-trip per rep), so the
Pallas numbers read ~2x slow. Now REPS distinct inputs are materialized
once at setup and the timed program loops over them; y is returned from
every rep so XLA cannot skip writing it (production writes y — it feeds
the 3x3 conv). Queued dispatch, single fence (round-2 RTT lesson).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")
from basedet_tpu.ops.fused_bn import fused_gemm_stats  # noqa: E402
from basedet_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

M, K, N = 819200, 256, 128
REPS, N_TIMED = 8, 5
BYTES_PER_REP = (M * K + M * N) * 2  # read x + write y (stats reads extra)


def fence(out):
    # axon: block_until_ready does NOT fence remote execution; a host
    # transfer does. Pull the tiny (N,) stats vector of the last rep.
    np.asarray(out[-1][1])


def timed(tag, prog, *args):
    fence(prog(*args))  # compile + fence
    t0 = time.perf_counter()
    for _ in range(N_TIMED):
        out = prog(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / N_TIMED / REPS * 1e3
    print(f"{tag:22s} {dt:8.3f} ms   "
          f"{BYTES_PER_REP/2**30/(dt/1e3):7.1f} GB/s eff", flush=True)
    return dt


rng = np.random.RandomState(0)
x0 = jnp.asarray(rng.randn(M, K) * 0.1, jnp.bfloat16)
xs = tuple(jax.block_until_ready(x0 + jnp.bfloat16(0.25 * i))
           for i in range(REPS))
del x0
w = jnp.asarray(rng.randn(K, N) / np.sqrt(K), jnp.bfloat16)
sc = jnp.ones((K,), jnp.float32)
sh = jnp.zeros((K,), jnp.float32)


@jax.jit
def xla_ref(xs, w):
    outs = []
    for xr in xs:
        y = jnp.dot(xr, w,
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        yf = y.astype(jnp.float32)
        outs.append((y, yf.sum(axis=0), (yf * yf).sum(axis=0)))
    return outs


def make_fused(tm, kind="act"):
    @jax.jit
    def prog(xs, w, sc, sh):
        outs = []
        for xr in xs:
            if kind == "act":
                terms = [("act", xr, w)]
            else:
                terms = [("raw", [(xr, sc, sh)], w)]
            outs.append(fused_gemm_stats(terms, tm=tm))
        return outs
    return prog


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    timed("xla dot+stats", xla_ref, xs, w)
    for tm in (512, 1024, 2048, 4096, 8192):
        timed(f"fused act tm{tm}", make_fused(tm), xs, w, sc, sh)
    timed("fused raw tm2048", make_fused(2048, "raw"), xs, w, sc, sh)
