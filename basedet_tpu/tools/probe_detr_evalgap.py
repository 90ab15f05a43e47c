"""Dissect the DETR train-vs-eval forward gap.

Round-5 finding: an 8-image constant-batch run memorizes its boxes under
the TRAIN forward (loss_giou 0.05 == matched IoU ~0.95,
logs/sanity_e2e_detr_r5y.log) yet the EVAL forward on the very same images
scores AP50 0.13 — so the two forwards disagree. With dropout 0 the only
remaining train/eval difference is BatchNorm (batch stats vs running
stats). This probe loads the final state saved by sanity_e2e, runs BOTH
forwards on the train images, and reports per-gt best-IoU under each —
isolating which side of the BN switch the failure lives on.

Usage (after `sanity_e2e --model detr --train-images 8 --eval-on-train
--detr-dropout 0 --out /tmp/e2e_detr_r5z`):
  python -m basedet_tpu.tools.probe_detr_evalgap --run /tmp/e2e_detr_r5z
"""
from __future__ import annotations

import argparse
import os
import pickle
from types import SimpleNamespace

import numpy as np


def _iou_xyxy(a, b):
    ix1 = np.maximum(a[:, None, 0], b[None, :, 0])
    iy1 = np.maximum(a[:, None, 1], b[None, :, 1])
    ix2 = np.minimum(a[:, None, 2], b[None, :, 2])
    iy2 = np.minimum(a[:, None, 3], b[None, :, 3])
    iw = np.clip(ix2 - ix1, 0, None)
    ih = np.clip(iy2 - iy1, 0, None)
    inter = iw * ih
    ar_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    ar_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(ar_a[:, None] + ar_b[None] - inter, 1e-9)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run", required=True,
                   help="sanity_e2e --out dir (final_state.pkl + dataset)")
    p.add_argument("--size", type=int, default=320)
    p.add_argument("--dropout", type=float, default=0.0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from basedet_tpu.data.collators.pad_collator import DetectionPadCollator
    from basedet_tpu.data.datasets.coco import COCODataset
    from basedet_tpu.tools.sanity_e2e import _make_cfg
    from basedet_tpu.utils import all_register, logger, setup_logger

    all_register()
    setup_logger()
    cfg_args = SimpleNamespace(
        steps=2000, batch=8, size=args.size, out=args.run,
        detr_dropout=args.dropout,
    )
    cfg = _make_cfg("detr", cfg_args)
    model = cfg.build_model()

    with open(os.path.join(args.run, "final_state.pkl"), "rb") as f:
        state = pickle.load(f)["state"]
    variables = {
        "params": state.params,
        **{k: v for k, v in state.model_state.items()},
    }

    ds = COCODataset(
        os.path.join(args.run, "train"),
        os.path.join(args.run, "instances_train.json"),
    )
    coll = DetectionPadCollator(max_instances=8)
    batch = dict(coll([ds[i] for i in range(len(ds))]))
    batch.pop("image_id", None)

    inputs = model._prepare(batch, train=True)
    m_eval = model.make_module(train=False)
    m_train = model.make_module(train=True)

    out_eval = m_eval.apply(variables, inputs["image"], inputs["mask"])
    out_train, _ = m_train.apply(
        variables, inputs["image"], inputs["mask"],
        rngs={"dropout": jax.random.PRNGKey(0)}, mutable=["batch_stats"],
    )

    size = args.size
    for name, (logits_all, coords_all) in (
        ("eval ", out_eval), ("train", out_train)
    ):
        coords = np.asarray(coords_all[-1], np.float32)  # (B, Q, 4) norm
        prob = np.asarray(
            jax.nn.softmax(jnp.asarray(logits_all[-1]), axis=-1)
        )
        ious, cls_ok = [], []
        for b in range(coords.shape[0]):
            gt = np.asarray(inputs["gt_boxes"][b])
            n = int(np.asarray(inputs["img_info"][b, 4]))
            if n == 0:
                continue
            c = coords[b]
            boxes = np.stack([
                (c[:, 0] - c[:, 2] / 2) * size,
                (c[:, 1] - c[:, 3] / 2) * size,
                (c[:, 0] + c[:, 2] / 2) * size,
                (c[:, 1] + c[:, 3] / 2) * size,
            ], axis=-1)
            iou = _iou_xyxy(gt[:n, :4], boxes)  # (n, Q)
            best_q = iou.argmax(axis=1)
            ious.append(iou.max(axis=1))
            pred_cls = prob[b, best_q, :-1].argmax(axis=-1) + 1
            cls_ok.append(pred_cls == gt[:n, 4].astype(int))
        ious = np.concatenate(ious)
        cls_ok = np.concatenate(cls_ok)
        logger.info(
            f"[{name}] per-gt best IoU: mean {ious.mean():.3f} "
            f"min {ious.min():.3f}  frac>=0.5 {np.mean(ious >= 0.5):.2f}  "
            f"class-correct@best {np.mean(cls_ok):.2f}"
        )

    # where the difference comes from: swap ONLY batch_stats with fresh
    # batch statistics is not expressible post-hoc; instead report how far
    # running stats drifted from the final batch's statistics at each BN
    bs = state.model_state.get("batch_stats", {})
    flat = jax.tree_util.tree_flatten_with_path(bs)[0]
    worst = sorted(
        (
            (float(np.abs(np.asarray(v)).max()), jax.tree_util.keystr(k))
            for k, v in flat if "var" not in jax.tree_util.keystr(k)
        ),
        reverse=True,
    )[:5]
    logger.info(f"largest |running mean| entries: {worst}")


if __name__ == "__main__":
    main()
