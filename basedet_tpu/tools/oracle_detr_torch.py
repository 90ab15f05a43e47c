"""Independent torch DETR oracle for the minibatch non-convergence bisect.

A minimal from-the-paper DETR (conv stem + torch TransformerEncoder/Decoder,
scipy Hungarian matching, the standard CE/L1/GIoU losses) trained on the SAME
synthetic rectangles task and minibatch regime as probe_detr. This is NOT a
port of anything in /root/reference (which is MegEngine); it exists to answer
one question: is the sanity regime (tiny DETR, N-image pool, batch 8, a few
thousand steps) learnable AT ALL by a known-good set-prediction recipe?

  * oracle learns, ours stalls  -> basedet_tpu DETR has a training bug
  * oracle stalls too           -> the regime is the problem (DETR's known
                                   slow-convergence), not the implementation

Runs on CPU (torch is CPU-only in this image). Usage:
  python -m basedet_tpu.tools.oracle_detr_torch --steps 800 --images 24
"""
from __future__ import annotations

import argparse
import math
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=800)
    p.add_argument("--images", type=int, default=24)
    p.add_argument("--minibatch", type=int, default=8)
    p.add_argument("--size", type=int, default=192)
    p.add_argument("--lr", type=float, default=4e-4)
    p.add_argument("--queries", type=int, default=16)
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--out", type=str, default="/tmp/oracle_detr")
    args = p.parse_args()

    import torch
    import torch.nn as nn
    import torch.nn.functional as F
    from scipy.optimize import linear_sum_assignment

    from basedet_tpu.tools.sanity_e2e import make_synthetic_coco
    from basedet_tpu.data.datasets.coco import COCODataset
    from basedet_tpu.utils import logger, setup_logger

    setup_logger()
    torch.manual_seed(0)
    torch.set_num_threads(max(1, os.cpu_count() or 1))

    (train_imgs, train_anno), _ = make_synthetic_coco(
        args.out, n_train=args.images, n_val=4, size=args.size
    )
    ds = COCODataset(train_imgs, train_anno)
    size = args.size

    imgs, gts = [], []
    for i in range(len(ds)):
        rec = ds[i]
        img = rec["image"].astype(np.float32) / 255.0  # (H, W, 3) RGB
        img = (img - np.array([0.485, 0.456, 0.406])) / np.array(
            [0.229, 0.224, 0.225]
        )
        imgs.append(img.transpose(2, 0, 1))
        b = rec["boxes"].astype(np.float32)  # (n, 4) xyxy
        xc = (b[:, 0] + b[:, 2]) / 2 / size
        yc = (b[:, 1] + b[:, 3]) / 2 / size
        w = (b[:, 2] - b[:, 0]) / size
        h = (b[:, 3] - b[:, 1]) / size
        cls = rec["labels"].astype(np.float32) - 1
        gts.append(
            dict(
                boxes=torch.tensor(np.stack([xc, yc, w, h], -1)),
                labels=torch.tensor(cls, dtype=torch.long),
            )
        )
    imgs = torch.tensor(np.stack(imgs), dtype=torch.float32)

    C = 3  # classes; background index C

    class MiniDETR(nn.Module):
        def __init__(self, dim, nq, nlayers):
            super().__init__()
            # small strided conv stem (stride 32 total, like res5)
            chans = [3, 64, 128, 128, 256, dim]
            stem = []
            for a, b in zip(chans[:-1], chans[1:]):
                stem += [nn.Conv2d(a, b, 3, stride=2, padding=1),
                         nn.GroupNorm(8, b), nn.ReLU()]
            self.stem = nn.Sequential(*stem)
            self.tr = nn.Transformer(
                d_model=dim, nhead=8, num_encoder_layers=nlayers,
                num_decoder_layers=nlayers, dim_feedforward=1024,
                dropout=0.0, batch_first=True,
            )
            self.query = nn.Embedding(nq, dim)
            self.cls = nn.Linear(dim, C + 1)
            self.box = nn.Sequential(
                nn.Linear(dim, dim), nn.ReLU(), nn.Linear(dim, 4)
            )
            self.row = nn.Parameter(torch.rand(50, dim // 2))
            self.col = nn.Parameter(torch.rand(50, dim // 2))

        def forward(self, x):
            f = self.stem(x)  # (B, D, H, W)
            B, D, H, W = f.shape
            pos = torch.cat(
                [
                    self.col[:W].unsqueeze(0).repeat(H, 1, 1),
                    self.row[:H].unsqueeze(1).repeat(1, W, 1),
                ],
                dim=-1,
            ).reshape(H * W, D)
            src = f.flatten(2).transpose(1, 2) + pos  # (B, HW, D)
            q = self.query.weight.unsqueeze(0).repeat(B, 1, 1)
            hs = self.tr(src, q)  # (B, Q, D)
            return self.cls(hs), self.box(hs).sigmoid()

    def giou(a, b):
        # a, b: (n, 4) xcycwh
        ax1, ay1 = a[:, 0] - a[:, 2] / 2, a[:, 1] - a[:, 3] / 2
        ax2, ay2 = a[:, 0] + a[:, 2] / 2, a[:, 1] + a[:, 3] / 2
        bx1, by1 = b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2
        bx2, by2 = b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2
        iw = (torch.min(ax2, bx2) - torch.max(ax1, bx1)).clamp(min=0)
        ih = (torch.min(ay2, by2) - torch.max(ay1, by1)).clamp(min=0)
        inter = iw * ih
        ua = (ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1) - inter
        iou = inter / ua.clamp(min=1e-7)
        ew = torch.max(ax2, bx2) - torch.min(ax1, bx1)
        eh = torch.max(ay2, by2) - torch.min(ay1, by1)
        enc = (ew * eh).clamp(min=1e-7)
        return iou - (enc - ua) / enc

    model = MiniDETR(args.dim, args.queries, args.layers)
    opt = torch.optim.AdamW(model.parameters(), lr=args.lr, weight_decay=1e-4)
    rng = np.random.RandomState(0)
    eos_w = torch.ones(C + 1)
    eos_w[C] = 0.1

    for step in range(args.steps):
        idx = rng.choice(args.images, args.minibatch, replace=False)
        x = imgs[idx]
        logits, boxes = model(x)
        total_ce = total_l1 = total_gi = 0.0
        nboxes = sum(len(gts[i]["labels"]) for i in idx)
        tgt_cls_b = torch.full(
            (len(idx), args.queries), C, dtype=torch.long
        )
        l1_terms, gi_terms = [], []
        for bi, i in enumerate(idx):
            t = gts[i]
            n = len(t["labels"])
            with torch.no_grad():
                prob = logits[bi].softmax(-1)
                cost = (
                    -prob[:, t["labels"]]
                    + 5 * torch.cdist(boxes[bi], t["boxes"], p=1)
                    - 2 * torch.stack(
                        [giou(boxes[bi], t["boxes"][j].expand_as(boxes[bi]))
                         for j in range(n)], dim=1)
                )
            r, c = linear_sum_assignment(cost.numpy())
            tgt_cls_b[bi, r] = t["labels"][c]
            l1_terms.append(
                (boxes[bi][r] - t["boxes"][c]).abs().sum()
            )
            gi_terms.append((1 - giou(boxes[bi][r], t["boxes"][c])).sum())
        loss_ce = F.cross_entropy(
            logits.reshape(-1, C + 1), tgt_cls_b.reshape(-1), weight=eos_w
        )
        loss_l1 = torch.stack(l1_terms).sum() / max(nboxes, 1)
        loss_gi = torch.stack(gi_terms).sum() / max(nboxes, 1)
        loss = loss_ce + 5 * loss_l1 + 2 * loss_gi
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        if step % 100 == 0 or step == args.steps - 1:
            logger.info(
                f"step {step}: total={float(loss):.4f} ce={float(loss_ce):.4f} "
                f"l1={float(loss_l1):.4f} giou={float(loss_gi):.4f}"
            )


if __name__ == "__main__":
    main()
