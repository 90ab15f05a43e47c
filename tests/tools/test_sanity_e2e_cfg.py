"""sanity_e2e config construction: the grad-clip stabilizer must apply to
the R-CNN family only. YOLOX trains unclipped (reference trains YOLOX with
no clip; a global max_norm=10 scales its ~400-norm init grads by ~40x and
pins the loss) and DETR uses the synthetic-overfit stabilizers (clip 1.0,
dropout 0, lr 5e-5 — the production 0.1/0.1/1e-4 values are the reference's
150-epoch COCO schedule and stall few-thousand-step synthetic runs; see
logs/probe_detr_overfit2)."""
from types import SimpleNamespace

from basedet_tpu.tools.sanity_e2e import _make_cfg


def _args(**kw):
    base = dict(steps=10, batch=2, size=64, out="/tmp/e2e_cfg_test",
                no_aug=False)
    base.update(kw)
    return SimpleNamespace(**base)


def test_rcnn_family_gets_clip():
    for model in ("retinanet", "faster_rcnn"):
        cfg = _make_cfg(model, _args())
        gc = cfg.TRAINER.GRAD_CLIP
        assert gc["ENABLE"] and gc["TYPE"] == "norm"
        assert gc["ARGS"]["max_norm"] == 10.0


def test_yolox_trains_unclipped():
    cfg = _make_cfg("yolox", _args())
    assert not cfg.TRAINER.GRAD_CLIP["ENABLE"]


def test_detr_synthetic_stabilizers():
    cfg = _make_cfg("detr", _args())
    gc = cfg.TRAINER.GRAD_CLIP
    assert gc["ENABLE"] and gc["ARGS"]["max_norm"] == 1.0
    assert cfg.MODEL.TRANSFORMER.DROPOUT == 0.0
    assert cfg.SOLVER.BASIC_LR == 5e-5


def test_yolox_no_aug_flag():
    cfg = _make_cfg("yolox", _args(no_aug=True))
    s = cfg.AUG.TRAIN_SETTING
    assert s.MOSAIC_PROB == 0.0 and not s.ENABLE_MIXUP
