"""Per-shape conv throughput probe on the real chip.

Measures bf16 matmul peak, then every conv shape that appears in the
YOLOX-S @640 b128 forward, reporting achieved TFLOP/s per shape. Identifies
which layers underfill the MXU (small channel counts) and what fraction of
step time each contributes.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from basedet_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

B = 128
ITERS = 10


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    float(np.asarray(out).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    float(np.asarray(out).reshape(-1)[0])
    return (time.perf_counter() - t0) / ITERS


def main():
    # matmul peak
    for n in (4096, 8192):
        a = jnp.ones((n, n), jnp.bfloat16)
        bm = jnp.ones((n, n), jnp.bfloat16)

        @jax.jit
        def mm(a, b):
            # chain 8 matmuls to amortize dispatch
            x = a
            for _ in range(8):
                x = x @ b
            return jnp.sum(x[:1, :1].astype(jnp.float32))

        dt = timeit(mm, a, bm)
        fl = 8 * 2 * n**3
        print(f"matmul {n}x{n} chain8: {dt*1e3:7.2f} ms  {fl/dt/1e12:6.1f} TF/s")

    # YOLOX-S conv shapes: (H, W, Cin, Cout, k, stride, count_in_model)
    # backbone + pafpn + head, width=0.5 depth=0.33 @640
    shapes = [
        ("stem 6x6/2", 640, 640, 3, 32, 6, 2, 1),
        ("dark2 dw", 320, 320, 32, 64, 3, 2, 1),
        ("dark2 csp1x1", 160, 160, 64, 32, 1, 1, 3),
        ("dark2 csp3x3", 160, 160, 32, 32, 3, 1, 1),
        ("dark3 down", 160, 160, 64, 128, 3, 2, 1),
        ("dark3 csp1x1", 80, 80, 128, 64, 1, 1, 3),
        ("dark3 b1x1", 80, 80, 64, 64, 1, 1, 3),
        ("dark3 b3x3", 80, 80, 64, 64, 3, 1, 3),
        ("dark4 down", 80, 80, 128, 256, 3, 2, 1),
        ("dark4 csp1x1", 40, 40, 256, 128, 1, 1, 3),
        ("dark4 b3x3", 40, 40, 128, 128, 3, 1, 3),
        ("dark5 down", 40, 40, 256, 512, 3, 2, 1),
        ("dark5 spp1x1", 20, 20, 512, 256, 1, 1, 2),
        ("dark5 csp3x3", 20, 20, 256, 256, 3, 1, 1),
        ("head stem", 80, 80, 128, 128, 1, 1, 3),
        ("head 3x3", 80, 80, 128, 128, 3, 1, 12),
        ("head cls", 80, 80, 128, 80, 1, 1, 3),
    ]
    tot = 0.0
    for name, H, W, ci, co, k, s, cnt in shapes:
        x = jnp.ones((B, H, W, ci), jnp.bfloat16)
        w = jnp.ones((k, k, ci, co), jnp.bfloat16)

        @jax.jit
        def conv(x, w, s=s, k=k):
            p = (k - 1) // 2
            y = jax.lax.conv_general_dilated(
                x, w, (s, s), [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return jnp.sum(y[:1, :1, :1, :1].astype(jnp.float32))

        dt = timeit(conv, x, w)
        ho, wo = H // s, W // s
        fl = 2 * B * ho * wo * co * ci * k * k
        tot += dt * cnt
        print(
            f"{name:14s} {H:4d}x{W:<4d} {ci:4d}->{co:<4d} k{k} s{s}: "
            f"{dt*1e3:7.2f} ms  {fl/dt/1e12:6.1f} TF/s  x{cnt} = {dt*cnt*1e3:7.1f} ms"
        )
    print(f"sum of fwd conv time (approx): {tot*1e3:.1f} ms")


if __name__ == "__main__":
    main()
