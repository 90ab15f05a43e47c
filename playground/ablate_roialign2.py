"""Bisect the fused RoIAlign: _prepare (weights/sort) vs per-level kernels."""
import time
import jax
import jax.numpy as jnp
import numpy as np
from basedet_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()
from basedet_tpu.ops import roi_align_pallas as rap

B, R, C = 8, 512, 256
sizes = [(160, 160), (80, 80), (40, 40), (20, 20)]
strides = (4, 8, 16, 32)
rng = np.random.RandomState(0)
feats = [jnp.asarray(rng.randn(B, h, w, C).astype(np.float32),
                     dtype=jnp.bfloat16) for h, w in sizes]
xy = rng.rand(B, R, 2) * 600
wh = rng.rand(B, R, 2) * 300 + 8
rois = jnp.asarray(
    np.concatenate([xy, np.minimum(xy + wh, 640)], -1).astype(np.float32))


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(leaf).reshape(-1)[0])


def timeit(name, fn, *args, n=10):
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:40s} {dt:8.2f} ms", flush=True)


prep = jax.jit(lambda r: rap._prepare(
    feats, r, strides, (7, 7), 2, True, 4, 224))
timeit("_prepare (weights+sort)", prep, rois)

per_level, order = jax.jit(
    lambda r: rap._prepare(feats, r, strides, (7, 7), 2, True, 4, 224))(rois)

for li, (feat, (py, px, mask)) in enumerate(zip(feats, per_level)):
    fn = jax.jit(lambda f, a, b, m: rap._level_call_fwd(f, a, b, m, False))
    timeit(f"level {li} kernel fwd {feat.shape[1]}x{feat.shape[2]}",
           fn, feat, py, px, mask)
    print("   active groups:",
          int(np.asarray(mask).sum()), "/", mask.shape[0] * mask.shape[1])

full = jax.jit(lambda fs, r: rap.pool_rois_multilevel(fs, r, strides, (7, 7)))
timeit("full pallas fwd", full, feats, rois)
