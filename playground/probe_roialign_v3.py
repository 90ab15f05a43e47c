"""A/B the v3 window RoIAlign vs v2 dense-separable at FRCNN train shapes
(b8 640 bf16, R=512, realistic roi distribution), fwd and fwd+bwd, plus
compiled-vs-oracle equality on hardware and the window overflow rate.
"""
from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from basedet_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

B, R, REPS, N_TIMED = 8, 512, 4, 5
SIZE = 640
STRIDES = (4, 8, 16, 32)
C = 256


def timed(name, prog, *args):
    float(np.asarray(jax.tree_util.tree_leaves(prog(*args))[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    outs = [prog(*args) for _ in range(N_TIMED)]
    float(np.asarray(jax.tree_util.tree_leaves(outs[-1])[0]).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / N_TIMED / REPS * 1e3
    print(f"{name:44s} {dt:8.3f} ms", flush=True)
    return dt


def make_rois(rng):
    sa = np.exp(rng.uniform(np.log(8), np.log(448), (B, R)))
    ar = np.exp(rng.uniform(np.log(0.5), np.log(2.0), (B, R)))
    w, h = sa * np.sqrt(ar), sa / np.sqrt(ar)
    cx = rng.uniform(0, SIZE, (B, R))
    cy = rng.uniform(0, SIZE, (B, R))
    x1 = np.clip(cx - w / 2, 0, SIZE - 1)
    y1 = np.clip(cy - h / 2, 0, SIZE - 1)
    x2 = np.clip(cx + w / 2, x1 + 1, SIZE)
    y2 = np.clip(cy + h / 2, y1 + 1, SIZE)
    return jnp.asarray(np.stack([x1, y1, x2, y2], -1).astype(np.float32))


def main():
    import basedet_tpu.ops.roi_align_window as raw
    from basedet_tpu.ops.roi_align_pallas import pool_rois_multilevel

    rng = np.random.RandomState(0)
    feats = tuple(
        jnp.asarray(rng.randn(B, SIZE // s, SIZE // s, C).astype(np.float32),
                    dtype=jnp.bfloat16)
        for s in STRIDES
    )
    rois = make_rois(rng)

    # -- schedule stats: window coverage at production shapes
    p = jax.jit(
        lambda fs, r: raw._prepare_v3(fs, r, STRIDES, (7, 7), 2, True, 4,
                                      224, raw._HW, raw._WW)
    )(feats, rois)
    n_act = sum(int(np.asarray(a).sum()) for a in p["act"])
    n_win = int(np.asarray(p["lvl_sel"] >= 0).sum())
    print(f"groups: active {n_act}, windowed {n_win}, "
          f"overflow {n_act - n_win} "
          f"({100.0 * (n_act - n_win) / max(n_act, 1):.1f}%)", flush=True)

    # -- equality on hardware vs v2 (both compiled)
    o3 = jax.jit(
        lambda fs, r: raw.pool_rois_window(fs, r, STRIDES, (7, 7))
    )(feats, rois)
    o2 = jax.jit(
        lambda fs, r: pool_rois_multilevel(fs, r, STRIDES, (7, 7))
    )(feats, rois)
    err = float(jnp.max(jnp.abs(o3.astype(jnp.float32)
                                - o2.astype(jnp.float32))))
    print(f"fwd v3 vs v2 max_abs: {err:.6f}", flush=True)

    gw = jnp.asarray(rng.randn(B, R, 7, 7, C).astype(np.float32),
                     dtype=jnp.bfloat16)

    def gtest(op):
        def loss(fs):
            out = op(fs, rois)
            return jnp.sum(out.astype(jnp.float32) * gw.astype(jnp.float32))
        return jax.jit(jax.grad(loss))(feats)

    g3 = gtest(lambda fs, r=rois: raw.pool_rois_window(fs, r, STRIDES, (7, 7)))
    g2 = gtest(lambda fs, r=rois: pool_rois_multilevel(fs, r, STRIDES, (7, 7)))
    for a, b in zip(g3, g2):
        d = float(jnp.max(jnp.abs(
            a.astype(jnp.float32) - b.astype(jnp.float32))))
        s = float(jnp.std(b.astype(jnp.float32))) + 1e-12
        print(f"bwd dF H={a.shape[1]:4d} max_abs={d:.4f} "
              f"abs/std={d / s:.3e}", flush=True)

    # -- timing (force the v2 backend: the dispatch default is now v3)
    os.environ["BASEDET_ROIALIGN_BACKEND"] = "pallas"
    for name, op in (
        ("v2 dense", lambda fs, r: pool_rois_multilevel(
            fs, r, STRIDES, (7, 7))),
        ("v3 window", lambda fs, r: raw.pool_rois_window(
            fs, r, STRIDES, (7, 7))),
    ):
        @jax.jit
        def prog_f(fs, r, op=op):
            acc = jnp.float32(0)
            for k in range(REPS):
                acc += op(fs, r + jnp.float32(k)).astype(jnp.float32).sum()
            return acc

        @jax.jit
        def prog_fb(fs, r, op=op):
            def loss(fs):
                acc = jnp.float32(0)
                for k in range(REPS):
                    acc += op(fs, r + jnp.float32(k)).astype(
                        jnp.float32).sum()
                return acc
            l, g2_ = jax.value_and_grad(loss)(fs)
            return l + sum(x.astype(jnp.float32).sum() for x in g2_)

        timed(f"{name} fwd", prog_f, feats, rois)
        timed(f"{name} fwd+bwd", prog_fb, feats, rois)
    os.environ.pop("BASEDET_ROIALIGN_BACKEND", None)

    # -- config sweep: group size / window extent (overflow vs steps/VMEM)
    for Gc, hw, ww in ((8, 96, 96), (16, 96, 64), (16, 96, 96)):
        raw._G, raw._HW, raw._WW = Gc, hw, ww
        p = jax.jit(
            lambda fs, r: raw._prepare_v3(fs, r, STRIDES, (7, 7), 2, True,
                                          4, 224, raw._HW, raw._WW)
        )(feats, rois)
        n_act = sum(int(np.asarray(a).sum()) for a in p["act"])
        n_win = int(np.asarray(p["lvl_sel"] >= 0).sum())
        print(f"G={Gc} win=({hw},{ww}): active {n_act} windowed {n_win} "
              f"overflow {100.0 * (n_act - n_win) / max(n_act, 1):.1f}%",
              flush=True)

        @jax.jit
        def prog_fb(fs, r):
            def loss(fs):
                acc = jnp.float32(0)
                for k in range(REPS):
                    acc += raw.pool_rois_window(
                        fs, r + jnp.float32(k), STRIDES, (7, 7)
                    ).astype(jnp.float32).sum()
                return acc
            l, g2_ = jax.value_and_grad(loss)(fs)
            return l + sum(x.astype(jnp.float32).sum() for x in g2_)

        try:
            timed(f"v3 G={Gc} win=({hw},{ww}) fwd+bwd", prog_fb, feats, rois)
        except Exception as e:  # VMEM overflow configs report and continue
            print(f"v3 G={Gc} win=({hw},{ww}) FAILED: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
    raw._G, raw._HW, raw._WW = 8, 64, 64


if __name__ == "__main__":
    main()
