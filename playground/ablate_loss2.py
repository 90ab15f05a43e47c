"""Bisect the 168ms YOLOX loss-path overhead (everything outside
_assign_single — see ablate_loss.py results).

Stages (each a separate jitted program, cheap-assign stubbed in all):
  S0: net fwd + flatten/concat to (B,R,C)/(B,R,4)/(B,R)   [head reshape]
  S1: S0 + decode to pred_xcycwh
  S2: S1 + cheap assignment + take_along_axis matched
  S3: S2 + iou loss + obj loss
  S4: S3 + cls loss (one_hot BCE over (B,R,C))
  S5: S4 with REAL SimOTA  (= full get_losses)
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
from basedet_tpu.layers.losses import binary_cross_entropy, iou_loss
from basedet_tpu.models.det.retinanet import _flatten_level
from basedet_tpu.parallel import make_mesh, shard_batch
from basedet_tpu.structures import convert_boxes
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
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
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

    def stage(v, b, upto: int, real_ota: bool = False):
        inputs = model.pre_process(b, train=True)
        (logits_l, offsets_l, objs_l), _ = module.apply(
            v, inputs["image"], mutable=["batch_stats"]
        )
        feat_sizes = [tuple(x.shape[1:3]) for x in logits_l]
        grids_l, strides_l = model.point_gen(feat_sizes)
        anchors = jnp.concatenate(grids_l, axis=0)
        strides_vec = jnp.concatenate(strides_l, axis=0)
        cls_logits = jnp.concatenate([_flatten_level(x, C) for x in logits_l], axis=1)
        raw_offsets = jnp.concatenate([_flatten_level(x, 4) for x in offsets_l], axis=1)
        obj_logits = jnp.concatenate([_flatten_level(x, 1) for x in objs_l], axis=1)[..., 0]
        if upto == 0:
            return (
                jnp.sum(cls_logits) + jnp.sum(raw_offsets) + jnp.sum(obj_logits)
            )
        xy = raw_offsets[..., :2] * strides_vec[None, :, None] + anchors[None, :, :]
        wh = jnp.exp(raw_offsets[..., 2:4]) * strides_vec[None, :, None]
        pred_xcycwh = jnp.concatenate([xy, wh], axis=-1)
        if upto == 1:
            return jnp.sum(pred_xcycwh)
        gt_boxes = inputs["gt_boxes"]
        num_valid = inputs["img_info"][:, 4].astype(jnp.int32)
        if real_ota:
            fg_mask, matched_gt, pred_iou = jax.lax.stop_gradient(
                jax.vmap(functools.partial(model._assign_single, anchors, strides_vec))(
                    gt_boxes, num_valid, pred_xcycwh, cls_logits, obj_logits[..., None]
                )
            )
        else:
            R = anchors.shape[0]
            fg_mask = jnp.broadcast_to((jnp.arange(R) % 100) == 0, (BATCH, R))
            matched_gt = jnp.zeros((BATCH, R), jnp.int32)
            pred_iou = jnp.full((BATCH, R), 0.5, jnp.float32)
        matched = jnp.take_along_axis(gt_boxes, matched_gt[..., None], axis=1)
        num_fg = jnp.maximum(jnp.sum(fg_mask).astype(jnp.float32), 1.0)
        if upto == 2:
            return jnp.sum(matched) + num_fg
        gt_xcycwh = convert_boxes(matched[..., :4], "xyxy", "xcycwh")
        loss_iou = (
            jnp.sum(
                iou_loss(pred_xcycwh, gt_xcycwh, box_mode="xcycwh", loss_type="square_iou")
                * fg_mask
            )
            / num_fg * 5.0
        )
        loss_obj = jnp.sum(
            binary_cross_entropy(obj_logits, fg_mask.astype(obj_logits.dtype), with_logits=True)
        ) / num_fg
        if upto == 3:
            return loss_iou + loss_obj
        labels0 = jnp.clip(matched[..., 4].astype(jnp.int32) - 1, 0, C - 1)
        cls_target = jax.nn.one_hot(labels0, C, dtype=cls_logits.dtype) * pred_iou[..., None]
        loss_cls = jnp.sum(
            binary_cross_entropy(cls_logits, cls_target, with_logits=True)
            * fg_mask[..., None]
        ) / num_fg
        return loss_iou + loss_obj + loss_cls

    for i in range(5):
        timeit(f"S{i}", jax.jit(functools.partial(stage, upto=i)), variables, batch)
    timeit("S5 (real SimOTA)", jax.jit(functools.partial(stage, upto=4, real_ota=True)), variables, batch)


if __name__ == "__main__":
    main()
