"""Standalone timing of Faster R-CNN's candidate hot ops at b8 640px shapes,
each repeated in-program to amortize dispatch latency.

  1. lax.top_k(scores, 2000) per level      (RPN pre-NMS selection)
  2. approx_max_k variant
  3. batched_nms_padded 10k cand -> 1000    (RPN proposal NMS)
  4. box_iou (50, 76725)                    (RPN GT assignment)
  5. multilevel_roi_align 512 rois          (RCNN pooling)
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from basedet_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from basedet_tpu.ops.nms import batched_nms_padded
from basedet_tpu.ops.roi_align import multilevel_roi_align
from basedet_tpu.structures import box_iou

B, ITERS, REPS = 8, 10, 4


def timeit(name, fn, *args):
    out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]  # queued; fence once
    out = outs[-1]
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / ITERS / REPS * 1e3
    print(f"{name:36s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    level_sizes = [3 * s * s for s in (80, 40, 20, 10, 5)]

    # 1/2: per-level top-2000 over B images (vmapped), 5 levels
    scores = [jnp.asarray(rng.randn(B, n).astype(np.float32)) for n in level_sizes]

    @jax.jit
    def topk_exact(scores):
        acc = 0.0
        for _ in range(REPS):
            for s in scores:
                k = min(2000, s.shape[1])
                v, i = jax.lax.top_k(s, k)
                acc += jnp.sum(v[:, 0]) + jnp.sum(i[:, 0])
        return acc

    timeit("RPN top2000 x5 levels (exact)", topk_exact, scores)

    @jax.jit
    def topk_approx(scores):
        acc = 0.0
        for _ in range(REPS):
            for s in scores:
                k = min(2000, s.shape[1])
                v, i = jax.lax.approx_max_k(s, k, recall_target=0.99)
                acc += jnp.sum(v[:, 0]) + jnp.sum(i[:, 0])
        return acc

    timeit("RPN top2000 x5 levels (approx)", topk_approx, scores)

    # 3: batched NMS 10k -> 1000 per image
    boxes = jnp.asarray(rng.rand(B, 10000, 4).astype(np.float32)) * 600
    boxes = boxes.at[..., 2:].set(boxes[..., :2] + 32 + boxes[..., 2:] * 0.2)
    nms_scores = jnp.asarray(rng.rand(B, 10000).astype(np.float32))
    levels = jnp.asarray(rng.randint(0, 5, size=(B, 10000)))

    @jax.jit
    def nms(boxes, scores, levels):
        acc = 0.0
        for r in range(REPS):
            out = jax.vmap(
                lambda b, s, l: batched_nms_padded(b, s + r * 1e-6, l, 0.7, 1000)
            )(boxes, scores, levels)
            acc += jnp.sum(out[2][:, 0])
        return acc

    timeit("batched NMS 10k->1000", nms, boxes, nms_scores, levels)

    # 4: box_iou (50, 76725) per image
    gt = jnp.asarray(rng.rand(B, 50, 4).astype(np.float32)) * 600
    anchors = jnp.asarray(rng.rand(76725, 4).astype(np.float32)) * 600

    @jax.jit
    def iou(gt, anchors):
        acc = 0.0
        for r in range(REPS):
            acc += jnp.sum(jax.vmap(lambda g: box_iou(g + r * 1e-6, anchors))(gt))
        return acc

    timeit("box_iou (50,76725) per img", iou, gt, anchors)

    # 5: multilevel roi_align 512 rois x 7x7 from P2-P5
    feats = [
        jnp.asarray(rng.randn(B, s, s, 256).astype(np.float32))
        for s in (160, 80, 40, 20)
    ]
    rois = jnp.concatenate(
        [
            jnp.repeat(jnp.arange(B, dtype=jnp.float32), 512)[:, None],
            jnp.asarray(rng.rand(B * 512, 4).astype(np.float32)) * 500,
        ],
        axis=1,
    )
    rois = rois.at[:, 3:].set(rois[:, 1:3] + 32 + rois[:, 3:] * 0.1)

    @jax.jit
    def roi(feats, rois):
        acc = 0.0
        for r in range(REPS):
            p = multilevel_roi_align(feats, rois + r * 1e-6, (4, 8, 16, 32), (7, 7))
            acc += jnp.sum(p[:, 0, 0, 0])
        return acc

    timeit("roi_align 512x8 rois", roi, feats, rois)


if __name__ == "__main__":
    main()
