"""fwd/bwd timing of multilevel_roi_align at Faster R-CNN b8 640 shapes."""
import time
import jax
import jax.numpy as jnp
import numpy as np
from basedet_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()
from basedet_tpu.ops.roi_align import multilevel_roi_align

B, R, C = 8, 512, 256
sizes = [(160, 160), (80, 80), (40, 40), (20, 20)]
strides = (4, 8, 16, 32)
rng = np.random.RandomState(0)
feats = [jnp.asarray(rng.randn(B, h, w, C).astype(np.float32), dtype=jnp.bfloat16)
         for h, w in sizes]
# random boxes in 640px image
xy = rng.rand(B * R, 2) * 600
wh = rng.rand(B * R, 2) * 300 + 8
rois_np = np.concatenate([
    np.repeat(np.arange(B), R)[:, None].astype(np.float32),
    xy, np.minimum(xy + wh, 640)], axis=1).astype(np.float32)
rois = jnp.asarray(rois_np)

def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(leaf).reshape(-1)[0])

def timeit(name, fn, *args):
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(20):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / 20 * 1e3
    print(f"{name:32s} {dt:8.2f} ms", flush=True)

fwd = jax.jit(lambda fs, r: multilevel_roi_align(fs, r, strides, (7, 7)))
timeit("gather fwd", fwd, feats, rois)

def loss(fs, r):
    return jnp.sum(multilevel_roi_align(fs, r, strides, (7, 7)).astype(jnp.float32))
import os
if os.environ.get("ROI_GATHER_BWD"):
    g = jax.jit(jax.grad(loss, argnums=0))
    timeit("gather fwd+bwd(dF)", g, feats, rois)

from basedet_tpu.ops.roi_align_separable import multilevel_roi_align_batched

rois_b = jnp.asarray(rois_np[:, 1:].reshape(B, R, 4))
fwd_s = jax.jit(lambda fs, r: multilevel_roi_align_batched(fs, r, strides, (7, 7)))
timeit("separable fwd", fwd_s, feats, rois_b)

def loss_s(fs, r):
    return jnp.sum(multilevel_roi_align_batched(fs, r, strides, (7, 7)).astype(jnp.float32))
g_s = jax.jit(jax.grad(loss_s, argnums=0))
timeit("separable fwd+bwd(dF)", g_s, feats, rois_b)

from basedet_tpu.ops.roi_align_pallas import pool_rois_multilevel

fwd_p = jax.jit(lambda fs, r: pool_rois_multilevel(fs, r, strides, (7, 7)))
timeit("pallas fused fwd", fwd_p, feats, rois_b)

def loss_p(fs, r):
    return jnp.sum(pool_rois_multilevel(fs, r, strides, (7, 7)).astype(jnp.float32))
g_p = jax.jit(jax.grad(loss_p, argnums=0))
timeit("pallas fused fwd+bwd(dF)", g_p, feats, rois_b)
