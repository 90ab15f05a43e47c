"""Is YOLOX-S's 3.2x bwd/fwd ratio structural? Time fwd vs fwd+bwd for
conv chains at representative shapes (bf16, in-program repetition)."""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from basedet_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

B, ITERS, REPS = 128, 10, 4


def timeit(name, fn, *args):
    out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]  # queued; fence once
    out = outs[-1]
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / ITERS / REPS * 1e3
    print(f"{name:34s} {dt:8.3f} ms", flush=True)
    return dt


def conv(x, w, s=1):
    k = w.shape[0]
    p = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w, (s, s), [(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def probe(name, H, ci, co, k, silu=True):
    x = jnp.ones((B, H, H, ci), jnp.bfloat16)
    w1 = jnp.full((k, k, ci, co), 0.01, jnp.bfloat16)
    w2 = jnp.full((k, k, co, ci), 0.01, jnp.bfloat16)

    def chain(x, w1, w2):
        for _ in range(REPS):
            y = conv(x, w1)
            if silu:
                y = jax.nn.silu(y)
            x = conv(y, w2) * 0.5
            if silu:
                x = jax.nn.silu(x)
        return jnp.sum(x.astype(jnp.float32))

    f = jax.jit(chain)
    d_f = timeit(f"{name} fwd", f, x, w1, w2)

    g = jax.jit(jax.grad(chain, argnums=(1, 2)))
    d_g = timeit(f"{name} fwd+bwd", g, x, w1, w2)
    print(f"{'':34s} ratio {d_g/d_f:5.2f}x")


def main():
    probe("3x3 80px 64<->64", 80, 64, 64, 3)
    probe("3x3 80px 128<->128", 80, 128, 128, 3)
    probe("1x1 160px 64<->32", 160, 64, 32, 1)
    probe("3x3 160px 32<->32", 160, 32, 32, 3)


if __name__ == "__main__":
    main()
