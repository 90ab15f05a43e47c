"""Bisect INSIDE YOLOX SimOTA (_assign_single) — cumulative stages, all
intermediates reduced into the output to defeat DCE.

  T0: net fwd + flatten + decode (baseline, everything the assign consumes)
  T1: + in_boxes/in_centers/candidate masks
  T2: + pairwise box_iou (K,R)
  T3: + p/sqrt/bce0/s0 over (R,C)
  T4: + p_y matmul + cls_cost + full cost matrix
  T5: + topk_dynamic_k_matching
  T6: + pred_iou pick  (= full assignment)
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from basedet_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from basedet_tpu.configs import YOLOXSConfig
from basedet_tpu.layers.common.function import onehot_pick_per_column
from basedet_tpu.layers.common.matcher import topk_dynamic_k_matching
from basedet_tpu.models.det.retinanet import _flatten_level
from basedet_tpu.parallel import make_mesh, shard_batch
from basedet_tpu.structures import box_iou, convert_boxes
from basedet_tpu.utils.dummy import DummyLoader

BATCH, IMG, ITERS = 128, 640, 10


def timeit(name, fn, *args):
    out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]  # queued; fence once
    out = outs[-1]
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:10s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    cfg = YOLOXSConfig()
    cfg.MODEL.BATCHSIZE = BATCH
    cfg.DATA.MAX_INSTANCES = 50
    cfg.TRAINER.AMP.ENABLE = True

    from basedet_tpu.layers.precision import configure_from_cfg

    configure_from_cfg(cfg)

    mesh = make_mesh((("data", 1),), devices=jax.devices()[:1])
    model = cfg.build_model()
    variables = model.init_variables(jax.random.PRNGKey(0), image_size=(IMG, IMG))
    loader = DummyLoader(batch_size=BATCH, image_size=(IMG, IMG), max_instances=50)
    batch = shard_batch(loader.make_batch(0), mesh)
    module = model.make_module(train=True)
    C = model.num_classes

    def assign_upto(anchors, strides_vec, upto, gt, num_valid, pred_xcycwh, cls_logits, obj_logits):
        acc = jnp.zeros((), jnp.float32)
        K = gt.shape[0]
        gt_valid = jnp.arange(K) < num_valid
        gt_xyxy = gt[:, :4]
        ax = anchors[None, :, 0]
        ay = anchors[None, :, 1]
        in_boxes = (
            jnp.minimum(
                jnp.minimum(ax - gt_xyxy[:, None, 0], ay - gt_xyxy[:, None, 1]),
                jnp.minimum(gt_xyxy[:, None, 2] - ax, gt_xyxy[:, None, 3] - ay),
            ) > 0
        )
        centers = (gt_xyxy[:, :2] + gt_xyxy[:, 2:4]) * 0.5
        radius = 2.5 * strides_vec[None, :]
        in_centers = (
            jnp.minimum(
                jnp.minimum(ax - (centers[:, None, 0] - radius), ay - (centers[:, None, 1] - radius)),
                jnp.minimum((centers[:, None, 0] + radius) - ax, (centers[:, None, 1] + radius) - ay),
            ) > 0
        )
        in_boxes &= gt_valid[:, None]
        in_centers &= gt_valid[:, None]
        candidate = jnp.any(in_boxes, axis=0) | jnp.any(in_centers, axis=0)
        both = in_boxes & in_centers
        acc += jnp.sum(candidate) + jnp.sum(both)
        if upto == 1:
            return acc
        pred_xyxy = convert_boxes(pred_xcycwh, "xcycwh", "xyxy")
        ious = box_iou(gt_xyxy, pred_xyxy)
        ious = jnp.where(gt_valid[:, None] & candidate[None, :], ious, 0.0)
        acc += jnp.sum(ious)
        if upto == 2:
            return acc
        p = jnp.sqrt(jax.nn.sigmoid(cls_logits) * jax.nn.sigmoid(obj_logits))
        eps = 1e-8
        bce0 = -jnp.log(jnp.maximum(1 - p, eps))
        s0 = jnp.sum(bce0, axis=-1)
        acc += jnp.sum(s0)
        if upto == 3:
            return acc
        labels0 = jnp.clip(gt[:, 4].astype(jnp.int32) - 1, 0, C - 1)
        onehot_y = jax.nn.one_hot(labels0, C, dtype=p.dtype)
        p_y = jax.lax.dot_general(
            onehot_y, p, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        cls_cost = s0[None, :] + jnp.log(jnp.maximum(1 - p_y, eps)) - jnp.log(jnp.maximum(p_y, eps))
        iou_cost = -jnp.log(ious + 1e-8)
        cost = (
            cls_cost + 3.0 * iou_cost + 100000.0 * (~both)
            + 1e9 * (~candidate)[None, :] + 1e9 * (~gt_valid)[:, None]
        )
        acc += jnp.sum(jnp.minimum(cost, 1e9))
        if upto == 4:
            return acc
        matched_gt, fg_mask = topk_dynamic_k_matching(cost, ious, gt_valid, candidate_topk=10)
        fg_mask &= candidate
        acc += jnp.sum(matched_gt) + jnp.sum(fg_mask)
        if upto == 5:
            return acc
        pred_iou = onehot_pick_per_column(ious, matched_gt)
        acc += jnp.sum(pred_iou)
        return acc

    def stage(v, b, upto):
        inputs = model.pre_process(b, train=True)
        (logits_l, offsets_l, objs_l), _ = module.apply(v, inputs["image"], mutable=["batch_stats"])
        feat_sizes = [tuple(x.shape[1:3]) for x in logits_l]
        grids_l, strides_l = model.point_gen(feat_sizes)
        anchors = jnp.concatenate(grids_l, axis=0)
        strides_vec = jnp.concatenate(strides_l, axis=0)
        cls_logits = jnp.concatenate([_flatten_level(x, C) for x in logits_l], axis=1)
        raw_offsets = jnp.concatenate([_flatten_level(x, 4) for x in offsets_l], axis=1)
        obj_logits = jnp.concatenate([_flatten_level(x, 1) for x in objs_l], axis=1)[..., 0]
        xy = raw_offsets[..., :2] * strides_vec[None, :, None] + anchors[None, :, :]
        wh = jnp.exp(raw_offsets[..., 2:4]) * strides_vec[None, :, None]
        pred_xcycwh = jnp.concatenate([xy, wh], axis=-1)
        base = jnp.sum(pred_xcycwh) + jnp.sum(cls_logits) + jnp.sum(obj_logits)
        if upto == 0:
            return base
        gt_boxes = inputs["gt_boxes"]
        num_valid = inputs["img_info"][:, 4].astype(jnp.int32)
        acc = jax.vmap(
            functools.partial(assign_upto, anchors, strides_vec, upto)
        )(gt_boxes, num_valid, pred_xcycwh, cls_logits, obj_logits[..., None])
        return base + jnp.sum(acc)

    for i in range(7):
        timeit(f"T{i}", jax.jit(functools.partial(stage, upto=i)), variables, batch)


if __name__ == "__main__":
    main()
