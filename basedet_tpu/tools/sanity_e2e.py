"""End-to-end sanity: synthesize a trivially-learnable COCO dataset on disk,
train a small detector on it, and evaluate box mAP with the in-repo COCOeval.

This exercises every subsystem in one run (dataset → transforms → collator →
jitted DP train step → checkpoint → inference → NMS → COCO metrics) and is
the round's stand-in for zoo-weight parity (the reference zoo is
unreachable from this environment).

Usage: python -m basedet_tpu.tools.sanity_e2e [--steps 300] [--out /tmp/e2e]
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def make_synthetic_coco(root: str, n_train=200, n_val=40, size=320, seed=0):
    """Solid rectangles on noise: class = rectangle color (3 classes)."""
    import cv2

    rng = np.random.RandomState(seed)
    colors = [(40, 40, 230), (40, 230, 40), (230, 40, 40)]  # BGR per class

    def gen_split(split, n, id_base):
        img_dir = os.path.join(root, split)
        os.makedirs(img_dir, exist_ok=True)
        images, annotations = [], []
        aid = id_base * 100000
        for i in range(n):
            img_id = id_base * 100000 + i + 1
            img = rng.randint(80, 176, (size, size, 3), np.uint8)
            n_obj = rng.randint(1, 4)
            for _ in range(n_obj):
                w = int(rng.randint(size // 8, size // 3))
                h = int(rng.randint(size // 8, size // 3))
                x = int(rng.randint(0, size - w))
                y = int(rng.randint(0, size - h))
                cls = int(rng.randint(0, 3))
                cv2.rectangle(img, (x, y), (x + w, y + h), colors[cls], -1)
                aid += 1
                annotations.append(
                    dict(
                        id=aid, image_id=img_id, category_id=cls + 1,
                        bbox=[float(x), float(y), float(w), float(h)],
                        area=float(w * h), iscrowd=0,
                    )
                )
            name = f"{img_id:012d}.jpg"
            cv2.imwrite(os.path.join(img_dir, name), img)
            images.append(
                dict(id=img_id, file_name=name, height=size, width=size)
            )
        categories = [
            dict(id=c + 1, name=f"class{c}") for c in range(3)
        ]
        anno = dict(images=images, annotations=annotations,
                    categories=categories)
        anno_path = os.path.join(root, f"instances_{split}.json")
        with open(anno_path, "w") as f:
            json.dump(anno, f)
        return img_dir, anno_path

    train = gen_split("train", n_train, 1)
    val = gen_split("val", n_val, 2)
    return train, val


def _make_cfg(model: str, args):
    """Small from-scratch-trainable config per model family."""
    from basedet_tpu import configs as C

    if model == "retinanet":
        cfg = C.RetinaNetConfig()
    elif model == "faster_rcnn":
        cfg = C.FasterRCNNConfig()
        cfg.MODEL.RPN.TRAIN_PREV_NMS_TOPK = 1000
        cfg.MODEL.RPN.TRAIN_POST_NMS_TOPK = 500
        cfg.MODEL.RCNN.NUM_ROIS = 128
    elif model == "detr":
        cfg = C.DETRConfig()
        cfg.MODEL.TRANSFORMER.NUM_ENCODERS = 2
        cfg.MODEL.TRANSFORMER.NUM_DECODERS = 2
        cfg.MODEL.NUM_QUERIES = 16
        # synthetic-overfit stabilizers (probe logs/probe_detr_overfit2:
        # perfect 2-image overfit in 200 steps with these; the production
        # values — dropout 0.1, clip 0.1, lr 1e-4/16 — are the reference's
        # 150-epoch COCO schedule and are far too conservative for a
        # few-thousand-step synthetic run)
        # r5 stability findings (probe_detr_r5h/j/k + sanity_e2e_detr_r5s):
        # lr 4e-4 (= 5e-5 x b8) escapes the class-marginal basin but
        # re-collapses around step ~2-3k without the reference's own
        # stabilizers; dropout 0.1 (reference value) both speeds the
        # escape (noise breaks the symmetric saddle) and regularizes, and
        # the reference's 0.1 grad clip bounds the box-loss spikes that
        # preceded the re-collapse.
        # dropout 0 for synthetic sanity runs: the round-5 eval-gap
        # experiment showed dropout 0.1 in this tiny-query/tiny-data
        # regime trains a sampled ensemble whose members memorize (train
        # giou 0.049) while the deterministic eval forward collapses
        # (AP50 0.128); with dropout 0 the same run scores AP 1.0
        # (logs/sanity_e2e_detr_r5{y,z}.log, probe_detr_evalgap). The
        # reference's 0.1 belongs to its 150-epoch/300-query COCO recipe.
        cfg.MODEL.TRANSFORMER.DROPOUT = (
            args.detr_dropout if getattr(args, "detr_dropout", None)
            is not None else 0.0
        )
        cfg.SOLVER.BASIC_LR = 5e-5
        # clip 1.0, NOT the reference's 0.1: the r5u run showed clip 0.1
        # re-strangles the escape (ce pinned at the ln(3) marginal through
        # step 2250 — from-scratch grad norms are O(1), so 0.1 rescales
        # every update ~10x, undoing the lr fix). The torch oracle that
        # PROVES this regime learnable (tools/oracle_detr_torch.py:178)
        # clips at 1.0 and reaches ce 0.07 in 800 steps; 1.0 still bounds
        # the box-loss spikes that preceded the r5s re-collapse.
        cfg.TRAINER.GRAD_CLIP = dict(
            ENABLE=True, TYPE="norm", ARGS=dict(max_norm=1.0)
        )
        # From-scratch training MUST NOT down-weight the backbone lr: the
        # reference's 0.1 ratio (detr_solver.py) assumes an ImageNet-
        # pretrained ResNet. With a random backbone at 0.1x lr the image
        # features stay uninformative and DETR settles into its
        # class-marginal collapse basin (every query predicts the dataset
        # mean regardless of the image) — root-caused by the r5 bisect:
        # constant-batch overfit perfect, shuffled minibatches pinned at
        # ce=1.33=ln(e)+marginal, torch oracle (full-lr stem) learns, and
        # our model under a flat full-lr AdamW escapes the basin
        # (logs/probe_detr_r5h_flat_adamw.log vs probe_detr_r5c/f/g).
        cfg.SOLVER.BACKBONE_LR_RATIO = 1.0
    elif model == "yolox":
        cfg = C.YOLOXNanoConfig()
        s = cfg.AUG.TRAIN_SETTING
        s.INPUT_SIZE = (args.size, args.size)
        # pin the multiscale schedule to one size (one compiled step)
        s.MULTISCALE_RANGE = (args.size // 32, args.size // 32)
        cfg.TEST.IMG_MIN_SIZE = cfg.TEST.IMG_MAX_SIZE = args.size
        cfg.TEST.CLS_THRESHOLD = 0.05
        cfg.SOLVER.WARM_EPOCH = None
        cfg.SOLVER.BASIC_LR = 0.02 / 64
        # the cosine schedule's no-aug tail must fit the short run
        cfg.SOLVER.EXTRA_LR_ARGS = dict(NO_AUG_EPOCH=1, MIN_LR_RATIO=0.05)
        if getattr(args, "no_aug", False):
            s.MOSAIC_PROB = 0.0
            s.ENABLE_MIXUP = False
    else:
        raise ValueError(model)
    if model != "yolox":
        cfg.MODEL.BACKBONE.NAME = "resnet18"
        # from-scratch training needs real (trainable) BN — FrozenBN with
        # init statistics is an identity transform (the reference always
        # loads ImageNet stats into FrozenBN; no pretrained weights here)
        cfg.MODEL.BACKBONE.NORM = "BN"
        cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.MODEL.BATCHSIZE = args.batch
    cfg.DATA.NUM_CLASSES = 3
    cfg.DATA.MAX_INSTANCES = 8
    if model not in ("detr", "yolox"):
        cfg.SOLVER.BASIC_LR = 0.01 / 16
    cfg.SOLVER.WARM_ITERS = 100
    if model not in ("yolox", "detr"):
        # R-CNN-family stabilizer for from-scratch synthetic training. NOT
        # applied to YOLOX: its sum/num_fg losses have init grad norms in
        # the hundreds, and a global clip of 10 scales every update by
        # ~10/400 — a single-batch overfit probe showed loss pinned at
        # ~12 for 300 steps WITH the clip vs 12.0→3.1 in 200 steps
        # without it (the reference trains YOLOX unclipped; only DETR
        # clips, at 0.1 — keep DETR's own config value too).
        cfg.TRAINER.GRAD_CLIP = dict(
            ENABLE=True, TYPE="norm", ARGS=dict(max_norm=10.0)
        )
    cfg.SOLVER.NUM_IMAGE_PER_EPOCH = 200
    cfg.SOLVER.MAX_EPOCH = max(1, args.steps * args.batch // 200)
    if model == "detr":
        # scale the reference's epoch-100-of-150 decay (detr_cfg.py) to the
        # sanity run length — otherwise the milestone fires at ~10% of the
        # run and the remaining 90% crawls at 0.1x lr (r5: the 24k-step run
        # printed lr=0.0000 from step 2500 on)
        cfg.SOLVER.LR_DECAY_STAGES = [
            max(1, int(cfg.SOLVER.MAX_EPOCH * 2 / 3))
        ]
    cfg.TEST.CLS_THRESHOLD = 0.05
    cfg.GLOBAL.OUTPUT_DIR = args.out
    return cfg


def main(args=None):
    parser = argparse.ArgumentParser("basedet_tpu e2e sanity")
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--out", type=str, default="/tmp/basedet_e2e")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--size", type=int, default=320)
    parser.add_argument(
        "--model", type=str, default="retinanet",
        help="retinanet | faster_rcnn | detr | all "
             "(reference eval flow per family: tools/det_test.py:40-118)",
    )
    parser.add_argument(
        "--no-aug", action="store_true",
        help="YOLOX: disable mosaic/mixup (the reference's no-aug final "
             "phase, engine/yolo_hooks.py) — short synthetic runs cannot "
             "converge under full mosaic augmentation",
    )
    parser.add_argument(
        "--detr-dropout", type=float, default=None,
        help="override the DETR sanity recipe's transformer dropout "
             "(0 isolates BN as the only train/eval forward difference)",
    )
    parser.add_argument(
        "--train-images", type=int, default=None,
        help="synthetic train-set size (default 200)",
    )
    parser.add_argument(
        "--eval-on-train", action="store_true",
        help="evaluate mAP on the TRAIN images (overfit protocol)",
    )
    parser.add_argument(
        "--no-aug-tail", type=int, default=None,
        help="YOLOX with-aug runs: number of final steps with mosaic/mixup "
             "off and the L1 loss on, mirroring the reference's flagship "
             "recipe (285 aug epochs + 15 no-aug, "
             "configs/det_model/yolox_cfg.py NO_AUG_EPOCH). Default: "
             "steps // 3 for a sanity-budget run.",
    )
    args = parser.parse_args(args)

    if args.model == "all":
        out = {}
        for name in ("retinanet", "faster_rcnn", "detr", "yolox"):
            out[name] = _run_one(name, args)
        print(json.dumps({
            m: {"AP": r.get("AP"), "AP50": r.get("AP50")}
            for m, r in out.items()
        }))
        return out
    return _run_one(args.model, args)


def _run_one(model_name: str, args):

    import jax

    from basedet_tpu.data.coco_loader import (
        TestLoader,
        _MappedLoader,
        PrefetchIterator,
    )
    from basedet_tpu.data.collators.pad_collator import DetectionPadCollator
    from basedet_tpu.data.datasets.coco import COCODataset
    from basedet_tpu.data.samplers.samplers import AspectRatioGroupSampler
    from basedet_tpu.engine.train_state import TrainState, make_train_step
    from basedet_tpu.parallel import make_mesh, replicate_state, shard_batch
    from basedet_tpu.utils import all_register, logger, setup_logger
    from basedet_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    all_register()
    setup_logger()
    n_train = getattr(args, "train_images", None) or 200
    (train_imgs, train_anno), (val_imgs, val_anno) = make_synthetic_coco(
        args.out, n_train=n_train, size=args.size
    )
    if getattr(args, "eval_on_train", False):
        # overfit protocol (VERDICT r4 item #1: "overfit the 40-image set
        # to AP >= 0.5"): train AP measures whether the training path can
        # drive the loss to memorization at all
        val_imgs, val_anno = train_imgs, train_anno

    cfg = _make_cfg(model_name, args)
    model = cfg.build_model()
    solver = cfg.build_solver()
    mesh = make_mesh((("data", 1),), devices=jax.devices()[:1])
    variables = model.init_variables(
        jax.random.PRNGKey(0), image_size=(args.size, args.size)
    )
    use_ema = bool(cfg.TRAINER.EMA.get("ENABLE", False))
    state = replicate_state(
        TrainState.create(variables, solver, ema=use_ema), mesh
    )
    step_fn = jax.jit(make_train_step(model, solver, cfg), donate_argnums=(0,))

    if model_name == "yolox":
        # the REAL YOLOX pipeline: mosaic/mixup/affine workers → pad collate
        from basedet_tpu.data.coco_loader import build_yolox_train_loader
        from basedet_tpu.data.datasets.info import register_dataset

        register_dataset("e2e_synth_train", train_imgs, train_anno)
        cfg.DATA.TRAIN.name = "e2e_synth_train"
        loader = build_yolox_train_loader(cfg, global_batch=args.batch)
    else:
        train_ds = COCODataset(train_imgs, train_anno)
        sampler = AspectRatioGroupSampler(
            train_ds.aspect_ratios(), batch_size=args.batch
        )
        collator = DetectionPadCollator(max_instances=8)
        loader = PrefetchIterator(
            lambda: iter(_MappedLoader(train_ds, None, lambda: iter(sampler), collator)),
            depth=2, infinite=True,
        )

    # with-aug YOLOX: schedule the reference's no-aug final phase (mosaic/
    # mixup off + L1 loss on, re-jitting the step) inside the sanity loop —
    # the trainer path does this via YoloxNoAugHook (engine/build.py)
    no_aug_tail = 0
    if model_name == "yolox" and not getattr(args, "no_aug", False):
        no_aug_tail = getattr(args, "no_aug_tail", None)
        if no_aug_tail is None:
            no_aug_tail = args.steps // 3

    batch_mapper = getattr(model, "train_batch_mapper", None)
    it = iter(loader)
    for step in range(args.steps):
        if no_aug_tail and step == args.steps - no_aug_tail:
            logger.info(
                f"step {step}: entering no-aug tail "
                f"({no_aug_tail} steps: mosaic/mixup off, L1 on)"
            )
            loader.mosaic_dataset.enable_mosaic = False
            loader.mosaic_dataset.enable_mixup = False
            loader.mapped_loader.request_pool_restart()
            model.use_l1 = True
            step_fn = jax.jit(
                make_train_step(model, solver, cfg), donate_argnums=(0,)
            )
        batch = dict(next(it))
        batch.pop("image_id", None)
        if batch_mapper is not None:
            batch = batch_mapper(batch, step)
        batch = shard_batch(batch, mesh)
        state, metrics = step_fn(state, batch)
        if step % 50 == 0 or step == args.steps - 1:
            terms = " ".join(
                f"{k}={float(v):.4f}" for k, v in sorted(metrics.items())
                if k != "total_loss"
            )
            logger.info(
                f"step {step}: total_loss={float(metrics['total_loss']):.4f} "
                f"{terms}"
            )

    # persist the final train state so post-run probes can dissect the
    # trained model without re-training (e.g. the DETR image-blindness /
    # train-vs-eval forward checks)
    import pickle

    from basedet_tpu.engine.hooks import jax_to_numpy

    with open(os.path.join(args.out, "final_state.pkl"), "wb") as f:
        pickle.dump({"state": jax_to_numpy(state)}, f)

    # evaluation
    val_ds = COCODataset(val_imgs, val_anno, remove_images_without_annotations=False)
    test_loader = TestLoader(
        val_ds, None, DetectionPadCollator(max_instances=8), batch_size=1
    )
    evaluator = cfg.build_evaluator()
    eval_vars = state.variables(ema=use_ema)
    results = evaluator.evaluate_model(model, eval_vars, test_loader)
    logger.info(f"E2E synthetic [{model_name}] results: {results}")
    print(json.dumps({"model": model_name,
                      "e2e_synthetic_AP": results.get("AP"),
                      "AP50": results.get("AP50")}))
    return results


if __name__ == "__main__":
    main()
