"""Packed (space-to-depth resident) stride-1 3x3 conv vs plain, on chip.

ablate_yolox_blocks found dark2 CSP64 @160 runs at 16-19 TF/s and dark3
CSP128 @80 at ~40 TF/s: bottleneck 3x3 convs with C=32/64 fill a quarter
(or less) of the MXU's 128 K-lanes and 128 N-lanes. A 3x3/s1 conv on
(H, W, C) is EXACTLY a 3x3/s1 conv on the space-to-depth packing
(H/2, W/2, 4C) with a phase-stacked kernel (3, 3, 4C, 4Co):

    Kp[r, t, (d_i, d_j, c), (a, b, o)] = w[2r+d_i-a+p-..., ...]  (else 0)

4x the FLOPs (3/4 of Kp is structurally zero) but K and N both fill, and
the output is itself packed -> chains through a whole stage with one
pack/unpack at the boundaries. This probe prices:
  plain     - lax conv on the original layout
  packed*   - lax conv on pre-packed input, packed output left packed
              (the stage-resident cost)
  roundtrip - s2d + packed conv + d2s (worst case: isolated use)
  im2col    - 9 shifted views concat on C (K=9C) + 1x1 conv (1x FLOPs,
              K filled, N still underfilled) - the cheaper alternative
for the shapes that dominate the YOLOX-S step. fwd and f+b.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from basedet_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

B, REPS, N_TIMED = 128, 8, 5


def pack_s1_kernel(w, p):
    """HWIO (k,k,C,Co) s1 kernel -> packed (ka,ka,4C,4Co); phase-major
    (d, c) in, (a, o) out; tap (r, d, a) reads u = 2r + d - a + p - r0*2
    where r0 is the packed left pad."""
    k, _, C, Co = w.shape
    # r range: u = 2r + d - a + p in [0, k) over d,a in {0,1}
    rs = sorted({(u - d + a - p) // 2
                 for u in range(k) for d in (0, 1) for a in (0, 1)
                 if (u - d + a - p) % 2 == 0})
    r_lo = rs[0]
    ka = rs[-1] - r_lo + 1
    kp = np.zeros((ka, ka, 2, 2, C, Co), np.float32)  # [r,t,di,dj,c,o] per (a,b)
    out = np.zeros((ka, ka, 2, 2, C, 2, 2, Co), np.float32)
    for a in range(2):
        for di in range(2):
            for r in range(r_lo, rs[-1] + 1):
                u = 2 * r + di - a + p
                if not (0 <= u < k):
                    continue
                for b in range(2):
                    for dj in range(2):
                        for t in range(r_lo, rs[-1] + 1):
                            v = 2 * t + dj - b + p
                            if 0 <= v < k:
                                out[r - r_lo, t - r_lo, di, dj, :, a, b, :] = \
                                    np.asarray(w[u, v], np.float32)
    del kp
    return jnp.asarray(
        out.reshape(ka, ka, 4 * C, 4 * Co), w.dtype), ka, -r_lo


def space_to_depth(x):
    B_, H, W, C = x.shape
    x = x.reshape(B_, H // 2, 2, W // 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B_, H // 2, W // 2, 4 * C)


def depth_to_space(x):
    B_, H2, W2, C4 = x.shape
    C = C4 // 4
    x = x.reshape(B_, H2, W2, 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B_, 2 * H2, 2 * W2, C)


def conv(x, w, pad):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [pad, pad],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def timed(tag, gflop, prog, *args):
    float(np.asarray(prog(*args)))
    t0 = time.perf_counter()
    outs = [prog(*args) for _ in range(N_TIMED)]
    float(np.asarray(outs[-1]))
    dt = (time.perf_counter() - t0) / N_TIMED / REPS * 1e3
    print(f"{tag:34s} {dt:8.3f} ms  {gflop/dt if gflop else 0:6.1f} TF/s",
          flush=True)


def run(name, H, C, Co, k=3):
    p = (k - 1) // 2
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, H, C).astype(np.float32) * .1,
                    jnp.bfloat16)
    w = jnp.asarray(rng.randn(k, k, C, Co).astype(np.float32) * .05,
                    jnp.bfloat16)
    xp = space_to_depth(x)
    wp, ka, q = pack_s1_kernel(w, p)
    gflop = 2 * B * H * H * C * Co * k * k / 1e9

    # correctness once (bf16 tolerance)
    yp = conv(xp, wp, (q, ka - 1 - q))
    y_ref = conv(x, w, (p, p))
    err = float(jnp.abs(depth_to_space(yp).astype(jnp.float32)
                        - y_ref.astype(jnp.float32)).max())
    scale = float(jnp.abs(y_ref.astype(jnp.float32)).max())
    print(f"{name}: packed-vs-plain max abs err {err:.3e} (scale {scale:.2f})",
          flush=True)

    def im2col(x, w):
        views = [jnp.roll(x, (1 - u, 1 - v), axis=(1, 2))
                 for u in range(k) for v in range(k)]
        cat = jnp.concatenate(views, axis=-1)
        wf = w.reshape(1, 1, k * k * C, Co)
        return jax.lax.conv_general_dilated(
            cat, wf, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    variants = (
        ("plain", lambda x, w: conv(x, w, (p, p)), x, w),
        ("packed*", lambda x, w: conv(x, w, (q, ka - 1 - q)), xp, wp),
        ("roundtrip",
         lambda x, w: depth_to_space(conv(space_to_depth(x), w,
                                          (q, ka - 1 - q))), x, wp),
        ("im2col", im2col, x, w),
    )
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

        timed(f"{name} fwd {tag}", gflop, fwd, xx, ww)
        timed(f"{name} f+b {tag}", gflop * 3, fwdbwd, xx, ww)


if __name__ == "__main__":
    run("3x3 32->32 @160", 160, 32, 32)   # dark2 bottleneck conv
    run("3x3 64->64 @80", 80, 64, 64)     # dark3 bottleneck conv
    run("3x3 128->128 @80", 80, 128, 128)  # head branch convs @P3
    run("3x3 32->64 @160", 160, 32, 64)
