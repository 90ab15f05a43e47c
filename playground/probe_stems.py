"""Stem formulations A/B at production shapes (queued-dispatch timing).

conv_eff `pack` mode showed the only packed-conv wins are the image stems
(tiny C_in, huge spatial). But round 1 measured slice-based space-to-depth
LOSING to the fused 2kx2k/s2 pixel conv (yolo_block._RearrangedStemConv
docstring). Settle it with the reshape-transpose s2d at the real shapes:

  YOLOX-S Focus stem  (b128, 640, 3->32):
    fused6   - one 6x6/s2 conv on the raw image (current production)
    s2d      - reshape-transpose pack -> 3x3/s1 conv on (320,320,12)
    packed*  - 3x3/s1 conv on pre-packed input (preprocessing emits packed)
  R50 stem  (b8, 640, 3->64, 7x7/s2 p3):
    plain    - current production
    s2d      - pack -> 4x4/s1 conv on (320,320,12) (ops/s2d_conv.py)
    packed*  - pre-packed
fwd (frozen trunks) and f+b (YOLOX / CenterNet trunks train).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from basedet_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from basedet_tpu.ops.s2d_conv import (  # noqa: E402
    pack_s2_kernel, packed_geometry, space_to_depth,
)

REPS, N_TIMED = 8, 5


def timed(tag, prog, *args):
    float(np.asarray(prog(*args)))
    t0 = time.perf_counter()
    outs = [prog(*args) for _ in range(N_TIMED)]
    float(np.asarray(outs[-1]))
    dt = (time.perf_counter() - t0) / N_TIMED / REPS * 1e3
    print(f"{tag:34s} {dt:8.3f} ms", flush=True)


def conv(x, w, s, pad):
    return jax.lax.conv_general_dilated(
        x, w, (s, s), [pad, pad],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def bench(name, variants):
    for tag, op, xx, ww in variants:
        @jax.jit
        def fwd(xx, ww, op=op):
            acc = jnp.float32(0)
            for r in range(REPS):
                acc += op(xx + jnp.bfloat16(r), ww).astype(jnp.float32).sum()
            return acc

        @jax.jit
        def fwdbwd(xx, ww, op=op):
            def loss(xx, ww):
                acc = jnp.float32(0)
                for r in range(REPS):
                    acc += op(xx + jnp.bfloat16(r), ww).astype(
                        jnp.float32).sum()
                return acc
            l, (gx, gw) = jax.value_and_grad(loss, argnums=(0, 1))(xx, ww)
            return l + gx.astype(jnp.float32).sum() + gw.astype(
                jnp.float32).sum()

        timed(f"{name} fwd {tag}", fwd, xx, ww)
        timed(f"{name} f+b {tag}", fwdbwd, xx, ww)


def yolox_stem(B=128):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, 640, 640, 3).astype(np.float32) * .1,
                    jnp.bfloat16)
    # focus-form kernel (3,3,12,32); fused pixel kernel derived from it
    w = jnp.asarray(rng.randn(3, 3, 12, 32).astype(np.float32) * .05,
                    jnp.bfloat16)
    # fused: w6[2ky+dy, 2kx+dx, c, o] = w[ky, kx, (2dx+dy)C+c, o]
    # (matches _RearrangedStemConv's rearrangement)
    wr = w.reshape(3, 3, 2, 2, 3, 32)            # (ky,kx,dx,dy,C,O)
    w6 = wr.transpose(0, 3, 1, 2, 4, 5).reshape(6, 6, 3, 32)
    xp = space_to_depth(x)

    # focus pad: SAME for 3x3 on packed grid = (1,1); fused = (2,2)@s2
    def fused(x, w6):
        return conv(x, w6, 2, (2, 2))

    def s2d(x, w):
        # NOTE: phase order differs between space_to_depth ((di,dj) blocks)
        # and the Focus kernel layout; for TIMING purposes the kernel
        # permutation is free (static), so plain conv on packed input is
        # representative.
        return conv(space_to_depth(x), w, 1, (1, 1))

    def packed(xp, w):
        return conv(xp, w, 1, (1, 1))

    bench("yolox stem b128", (
        ("fused6", fused, x, w6),
        ("s2d", s2d, x, w),
        ("packed*", packed, xp, w),
    ))


def r50_stem(B=8):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, 640, 640, 3).astype(np.float32) * .1,
                    jnp.bfloat16)
    w = jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32) * .05,
                    jnp.bfloat16)
    wp = pack_s2_kernel(w, 3)
    ka, q = packed_geometry(7, 3)
    Ho = (640 + 6 - 7) // 2 + 1
    pad_hi = Ho - 320 - q + ka - 1

    def plain(x, w):
        return conv(x, w, 2, (3, 3))

    def s2d(x, wp):
        return conv(space_to_depth(x), wp, 1, (q, pad_hi))

    def packed(xp, wp):
        return conv(xp, wp, 1, (q, pad_hi))

    # correctness of the packed form vs plain (exact modulo bf16)
    err = float(jnp.abs(
        s2d(x, wp).astype(jnp.float32) - plain(x, w).astype(jnp.float32)
    ).max())
    print(f"r50 stem s2d-vs-plain max abs err {err:.3e}", flush=True)

    xp = space_to_depth(x)
    bench("r50 stem b8", (
        ("plain", plain, x, w),
        ("s2d", s2d, x, wp),
        ("packed*", packed, xp, wp),
    ))


if __name__ == "__main__":
    r50_stem()
    yolox_stem()
