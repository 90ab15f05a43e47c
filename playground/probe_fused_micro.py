"""Micro A/B: ONE fused GEMM+stats Pallas call vs its XLA equivalent.

Isolates the kernel cost from the chain glue (probe_fused_bn.py showed the
full fused dark2 chain 3x SLOWER than XLA, 21.4 vs 7.3 ms fwd). Shapes are
the lane-packed dark2 conv1: x (819200, 256) bf16 @ w (256, 128).

Timed per variant (queued dispatch, single fence — round-2 RTT lesson):
  xla          y = x@w; s = sum(y); ss = sum(y*y)   (what we're beating)
  fused tmXXX  fused_gemm_stats act-term, TM sweep
  fused raw    one raw input term (normalize+SiLU prologue)
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


def timed(tag, prog, *args):
    float(np.asarray(prog(*args)))  # compile + fence (axon: np.asarray fences)
    t0 = time.perf_counter()
    outs = [prog(*args) for _ in range(N_TIMED)]
    float(np.asarray(outs[-1]))
    dt = (time.perf_counter() - t0) / N_TIMED / REPS * 1e3
    bytes_ = (M * K + M * N) * 2
    print(f"{tag:22s} {dt:8.3f} ms   {bytes_/2**30/(dt/1e3):7.1f} GB/s eff",
          flush=True)
    return dt


rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(M, K) * 0.1, jnp.bfloat16)
w = jnp.asarray(rng.randn(K, N) / np.sqrt(K), jnp.bfloat16)
sc = jnp.ones((K,), jnp.float32)
sh = jnp.zeros((K,), jnp.float32)


@jax.jit
def xla_ref(x, w):
    acc = jnp.float32(0)
    for r in range(REPS):
        y = jnp.dot(x + jnp.bfloat16(r), w,
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        yf = y.astype(jnp.float32)
        acc += yf.sum() + (yf * yf).sum()
    return acc


def make_fused(tm, kind="act"):
    @jax.jit
    def prog(x, w, sc, sh):
        acc = jnp.float32(0)
        for r in range(REPS):
            xr = x + jnp.bfloat16(r)
            if kind == "act":
                terms = [("act", xr, w)]
            else:
                terms = [("raw", [(xr, sc, sh)], w)]
            y, s, ss = fused_gemm_stats(terms, tm=tm)
            acc += s.sum() + ss.sum() + y.astype(jnp.float32).sum()
        return acc
    return prog


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    # XLA also pays a stats pass; make it comparable (y sum + y*y sum)
    timed("xla dot+stats", xla_ref, x, w)
    for tm in (512, 1024, 2048, 4096, 8192):
        timed(f"fused act tm{tm}", make_fused(tm), x, w, sc, sh)
    timed("fused raw tm2048", make_fused(2048, "raw"), x, w, sc, sh)
