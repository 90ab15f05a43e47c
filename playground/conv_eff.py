"""Achieved TF/s for representative R50/FPN convs, fwd and fwd+bwd.

Each case is REPS-amortized inside one jitted program (axon dispatch ~3 ms).
Prints useful-GFLOP, ms, and TF/s to locate where the 197 TF/s v5e peak is
lost (lane underfill? wgrad? dgrad?).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from basedet_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

B, REPS, N_TIMED = 8, 8, 5


def conv(x, w, s=1):
    k = w.shape[0]
    p = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w, (s, s), [(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def run(name, H, ci, co, k, s=1, dtype=jnp.bfloat16):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, H, ci).astype(np.float32) * .1, dtype)
    w = jnp.asarray(rng.randn(k, k, ci, co).astype(np.float32) * .01, dtype)
    Ho = H // s
    gflop = 2 * B * Ho * Ho * ci * co * k * k / 1e9

    @jax.jit
    def fwd(x, w):
        acc = jnp.float32(0)
        for r in range(REPS):
            acc += conv(x + jnp.asarray(r, dtype), w, s).astype(jnp.float32).sum()
        return acc

    @jax.jit
    def fwdbwd(x, w):
        def loss(x, w):
            acc = jnp.float32(0)
            for r in range(REPS):
                acc += conv(x + jnp.asarray(r, dtype), w, s).astype(jnp.float32).sum()
            return acc
        l, (gx, gw) = jax.value_and_grad(loss, argnums=(0, 1))(x, w)
        return l + gx.astype(jnp.float32).sum() + gw.astype(jnp.float32).sum()

    for mode, prog, mult in (("fwd", fwd, 1), ("f+b", fwdbwd, 3)):
        # queue all timed calls, fence ONCE: a per-call scalar readback pays
        # the axon tunnel round-trip (~30 ms) per call and floors every
        # sub-5ms measurement (discovered 2026-08-17; the benchmark tool
        # always queued, which is why its step numbers disagreed with
        # per-call-fenced probes)
        float(np.asarray(prog(x, w)))
        t0 = time.perf_counter()
        outs = [prog(x, w) for _ in range(N_TIMED)]
        float(np.asarray(outs[-1]))
        dt = (time.perf_counter() - t0) / N_TIMED / REPS * 1e3
        tf = gflop * mult / dt
        print(f"{name:28s} {mode}  {gflop*mult:7.1f} GF {dt:7.3f} ms "
              f"{tf:6.1f} TF/s", flush=True)


def run_dgrad_ab(name, H, ci, co, k, s=2):
    """A/B: jax.grad of plain conv vs conv2d_s2 custom-VJP (dx+dw)."""
    from basedet_tpu.ops.conv_s2 import conv2d_s2
    p = (k - 1) // 2 if k != 6 else 2
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, H, ci).astype(np.float32) * .1,
                    jnp.bfloat16)
    w = jnp.asarray(rng.randn(k, k, ci, co).astype(np.float32) * .01,
                    jnp.bfloat16)

    def plain(x, w):
        return conv(x, w, s) if k != 6 else jax.lax.conv_general_dilated(
            x, w, (2, 2), [(2, 2), (2, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def sub(x, w):
        return conv2d_s2(x, w, (p, p))

    for tag, op in (("plain", plain), ("subpix", sub)):
        @jax.jit
        def prog(x, w, op=op):
            def loss(x, w):
                acc = jnp.float32(0)
                for r in range(REPS):
                    acc += op(x + jnp.asarray(r, x.dtype), w).astype(
                        jnp.float32).sum()
                return acc
            l, (gx, gw) = jax.value_and_grad(loss, argnums=(0, 1))(x, w)
            return l + gx.astype(jnp.float32).sum() + gw.astype(
                jnp.float32).sum()

        float(np.asarray(prog(x, w)))
        t0 = time.perf_counter()
        outs = [prog(x, w) for _ in range(N_TIMED)]
        float(np.asarray(outs[-1]))
        dt = (time.perf_counter() - t0) / N_TIMED / REPS * 1e3
        print(f"{name} f+b {tag:7s} {dt:8.3f} ms", flush=True)


def run_pack_ab(name, H, ci, co, k, p):
    """A/B: plain k×k/s2 conv vs space-to-depth packed stride-1 form
    (ops/s2d_conv.py), fwd and f+b. 'packed*' rows time the conv on
    pre-packed input (no transpose), isolating the pack cost."""
    from basedet_tpu.ops.s2d_conv import (
        pack_s2_kernel, s2d_conv, space_to_depth, packed_geometry,
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, H, ci).astype(np.float32) * .1,
                    jnp.bfloat16)
    w = jnp.asarray(rng.randn(k, k, ci, co).astype(np.float32) * .01,
                    jnp.bfloat16)
    xp = space_to_depth(x)
    wp = pack_s2_kernel(w, p)
    ka, q = packed_geometry(k, p)
    Ho = (H + 2 * p - k) // 2 + 1
    pad_hi = Ho - (H // 2) - q + ka - 1

    def plain(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (2, 2), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def packed_pre(xp, wp):  # input already in packed layout
        return jax.lax.conv_general_dilated(
            xp, wp, (1, 1), [(q, pad_hi), (q, pad_hi)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    variants = (
        ("plain", plain, x, w),
        ("s2d", lambda x, w: s2d_conv(x, w, p), x, w),
        ("packed*", packed_pre, xp, wp),
    )
    for tag, op, xx, ww in variants:
        @jax.jit
        def fwd(xx, ww, op=op):
            acc = jnp.float32(0)
            for r in range(REPS):
                acc += op(xx + jnp.asarray(r, xx.dtype), ww).astype(
                    jnp.float32).sum()
            return acc

        @jax.jit
        def fwdbwd(xx, ww, op=op):
            def loss(xx, ww):
                acc = jnp.float32(0)
                for r in range(REPS):
                    acc += op(xx + jnp.asarray(r, xx.dtype), ww).astype(
                        jnp.float32).sum()
                return acc
            l, (gx, gw) = jax.value_and_grad(loss, argnums=(0, 1))(xx, ww)
            return l + gx.astype(jnp.float32).sum() + gw.astype(
                jnp.float32).sum()

        for mode, prog in (("fwd", fwd), ("f+b", fwdbwd)):
            float(np.asarray(prog(xx, ww)))
            t0 = time.perf_counter()
            outs = [prog(xx, ww) for _ in range(N_TIMED)]
            float(np.asarray(outs[-1]))
            dt = (time.perf_counter() - t0) / N_TIMED / REPS * 1e3
            print(f"{name} {mode} {tag:8s} {dt:8.3f} ms", flush=True)


if __name__ == "__main__":
    import sys

    cases = {
        "res2": ("res2 3x3 64->64 @160", 160, 64, 64, 3, 1),
        "res3": ("res3 3x3 128->128 @80", 80, 128, 128, 3, 1),
        "res4": ("res4 3x3 256->256 @40", 40, 256, 256, 3, 1),
        "rpn": ("rpn 3x3 256->256 @160", 160, 256, 256, 3, 1),
        "stem": ("stem 7x7/2 3->64 @640", 640, 3, 64, 7, 2),
        "s2a": ("dark3 3x3/2 64->128 @160", 160, 64, 128, 3, 2),
        "s2b": ("dark4 3x3/2 128->256 @80", 80, 128, 256, 3, 2),
        "s2c": ("res3ds 1x1/2 256->512 @80", 80, 256, 512, 1, 2),
    }
    if sys.argv[1:] == ["maxpool"]:
        import flax.linen as fnn
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(B, 320, 320, 64).astype(np.float32) * .1,
                        jnp.bfloat16)

        @jax.jit
        def mp_fwd(x):
            acc = jnp.float32(0)
            for r in range(REPS):
                acc += fnn.max_pool(
                    x + jnp.asarray(r, x.dtype), (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1))).astype(jnp.float32).sum()
            return acc

        @jax.jit
        def mp_fb(x):
            def loss(x):
                acc = jnp.float32(0)
                for r in range(REPS):
                    acc += fnn.max_pool(
                        x + jnp.asarray(r, x.dtype), (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1))).astype(jnp.float32).sum()
                return acc
            l, g = jax.value_and_grad(loss)(x)
            return l + g.astype(jnp.float32).sum()

        for tag, prog in (("fwd", mp_fwd), ("f+b", mp_fb)):
            float(np.asarray(prog(x)))
            t0 = time.perf_counter()
            outs = [prog(x) for _ in range(N_TIMED)]
            float(np.asarray(outs[-1]))
            dt = (time.perf_counter() - t0) / N_TIMED / REPS * 1e3
            print(f"maxpool3x3/2 64ch @320 {tag} {dt:8.3f} ms", flush=True)
    elif sys.argv[1:] == ["pack"]:
        run_pack_ab("dark3 3x3/2 64->128 @160", 160, 64, 128, 3, 1)
        run_pack_ab("dark4 3x3/2 128->256 @80", 80, 128, 256, 3, 1)
        run_pack_ab("dark5 3x3/2 256->512 @40", 40, 256, 512, 3, 1)
        run_pack_ab("stem6 6x6/2 12->32 @320", 320, 12, 32, 6, 2)
        run_pack_ab("res-ds 1x1/2 256->512 @80", 80, 256, 512, 1, 0)
        run_pack_ab("r50stem 7x7/2 3->64 @640", 640, 3, 64, 7, 3)
    elif sys.argv[1:] == ["dgrad"]:
        run_dgrad_ab("dark3 3x3/2 64->128 @160", 160, 64, 128, 3)
        run_dgrad_ab("dark4 3x3/2 128->256 @80", 80, 128, 256, 3)
        run_dgrad_ab("stem6 6x6/2 12->32 @320", 320, 12, 32, 6)
        run_dgrad_ab("res 1x1/2 256->512 @80", 80, 256, 512, 1)
    else:
        names = sys.argv[1:] or list(cases)
        for n in names:
            c = cases[n]
            run(*c[:5], s=c[5])
