"""Conv throughput probe v2: in-program repetition (lax.scan-free chain)
to amortize the ~3ms per-dispatch tunnel latency that poisoned v1.

Each conv shape is timed as 8 paired convs (Cin->Cout->Cin) inside one jitted
program; reported TF/s covers the whole chain. Also probes BN(train) and SiLU
epilogue costs on a representative tensor.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from basedet_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

B = 128
REPS = 8
ITERS = 10


def timeit(fn, *args):
    out = fn(*args)
    float(np.asarray(out).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    float(np.asarray(out).reshape(-1)[0])
    return (time.perf_counter() - t0) / ITERS


def conv(x, w, s, k):
    p = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w, (s, s), [(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def probe(name, H, W, ci, co, k):
    x = jnp.ones((B, H, W, ci), jnp.bfloat16)
    w1 = jnp.ones((k, k, ci, co), jnp.bfloat16) * 0.01
    w2 = jnp.ones((k, k, co, ci), jnp.bfloat16) * 0.01

    @jax.jit
    def chain(x, w1, w2):
        for _ in range(REPS):
            y = conv(x, w1, 1, k)
            x = conv(y, w2, 1, k) * 0.5
        return jnp.sum(x[:1, :1, :1, :1].astype(jnp.float32))

    dt = timeit(chain, x, w1, w2)
    fl = REPS * 2 * 2 * B * H * W * co * ci * k * k
    bytes_moved = REPS * 2 * B * H * W * (ci + co) * 2
    per = dt / (REPS * 2) * 1e3
    print(
        f"{name:22s} {H:4d}x{W:<4d} {ci:4d}<->{co:<4d} k{k}: "
        f"{per:6.3f} ms/conv  {fl/dt/1e12:6.1f} TF/s  {bytes_moved/dt/1e9:6.0f} GB/s"
    )
    return per


def main():
    probe("dark2 csp1x1", 160, 160, 64, 32, 1)
    probe("dark3 b1x1", 80, 80, 64, 64, 1)
    probe("dark3 csp1x1", 80, 80, 128, 64, 1)
    probe("dark3 b3x3", 80, 80, 64, 64, 3)
    probe("dark4 b3x3", 40, 40, 128, 128, 3)
    probe("dark5 csp3x3", 20, 20, 256, 256, 3)
    probe("head 3x3", 80, 80, 128, 128, 3)
    probe("head 3x3 @40", 40, 40, 128, 128, 3)
    probe("wide 3x3 @80 256", 80, 80, 256, 256, 3)

    # BN(train) + SiLU epilogue cost on a (B,160,160,64) tensor
    x = jnp.ones((B, 160, 160, 64), jnp.bfloat16)
    w = jnp.ones((3, 3, 64, 64), jnp.bfloat16) * 0.01

    @jax.jit
    def conv_only(x, w):
        for _ in range(REPS):
            x = conv(x, w, 1, 3) * 0.5
        return jnp.sum(x[:1, :1, :1, :1].astype(jnp.float32))

    @jax.jit
    def conv_bn_silu(x, w):
        for _ in range(REPS):
            y = conv(x, w, 1, 3)
            yf = y.astype(jnp.float32)
            mean = jnp.mean(yf, axis=(0, 1, 2))
            var = jnp.mean(jnp.square(yf), axis=(0, 1, 2)) - mean**2
            y = (yf - mean) * jax.lax.rsqrt(var + 1e-3)
            x = jax.nn.silu(y).astype(jnp.bfloat16)
        return jnp.sum(x[:1, :1, :1, :1].astype(jnp.float32))

    @jax.jit
    def conv_frozen_silu(x, w):
        sc = jnp.full((64,), 0.9, jnp.bfloat16)
        bi = jnp.full((64,), 0.1, jnp.bfloat16)
        for _ in range(REPS):
            y = conv(x, w, 1, 3)
            x = jax.nn.silu(y * sc + bi)
        return jnp.sum(x[:1, :1, :1, :1].astype(jnp.float32))

    d0 = timeit(conv_only, x, w) / REPS * 1e3
    d1 = timeit(conv_bn_silu, x, w) / REPS * 1e3
    d2 = timeit(conv_frozen_silu, x, w) / REPS * 1e3
    print(f"conv3x3@160x160x64 alone : {d0:6.3f} ms")
    print(f" + train-BN + SiLU       : {d1:6.3f} ms  (BN stats cost {d1-d0:+.3f})")
    print(f" + frozen-BN + SiLU      : {d2:6.3f} ms  (epilogue cost {d2-d0:+.3f})")


if __name__ == "__main__":
    main()
