"""Per-model loss + inference smoke tests on synthetic batches
(model: reference tests/models/test_build_model.py + per-model tests).
Small backbones/budgets keep CPU CI tractable."""
import jax
import numpy as np
import pytest

from basedet_tpu.utils.dummy import DummyLoader


def _small(cfg):
    cfg.MODEL.BACKBONE.NAME = "resnet18"
    if "RPN" in cfg.MODEL:
        cfg.MODEL.RPN.TRAIN_PREV_NMS_TOPK = 200
        cfg.MODEL.RPN.TRAIN_POST_NMS_TOPK = 100
        cfg.MODEL.RPN.TEST_PREV_NMS_TOPK = 200
        cfg.MODEL.RPN.TEST_POST_NMS_TOPK = 100
        cfg.MODEL.RCNN.NUM_ROIS = 64
    return cfg


def _configs():
    from basedet_tpu import configs as C

    return {
        "FCOS": C.FCOSConfig,
        "ATSS": C.ATSSConfig,
        "FreeAnchor": C.FreeAnchorConfig,
        "FasterRCNN": C.FasterRCNNConfig,
    }


@pytest.mark.parametrize("name", list(_configs()))
def test_model_losses_and_inference(name):
    cfg = _small(_configs()[name]())
    model = cfg.build_model()
    batch = DummyLoader(
        batch_size=2, image_size=(96, 96), max_instances=6
    ).make_batch()
    variables = model.init_variables(jax.random.PRNGKey(0), image_size=(96, 96))
    total, losses, _ = model.get_losses(variables, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(total)), f"{name} loss not finite"
    assert "total_loss" in losses
    dets = model.inference(variables, batch)
    assert dets["boxes"].shape[:2] == (2, cfg.TEST.MAX_BOXES_PER_IMAGE)
    assert np.isfinite(np.asarray(dets["boxes"])).all()
