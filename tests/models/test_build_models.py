"""Per-model loss + inference smoke tests on synthetic batches
(model: reference tests/models/test_{model}.py + test_build_model.py).
Small backbones/budgets keep CPU CI tractable."""
import jax
import numpy as np
import pytest

from basedet_tpu.utils.dummy import DummyLoader


from tests.tiny import shrink as _small  # noqa: E402


def _configs():
    from basedet_tpu import configs as C

    return {
        "RetinaNet": C.RetinaNetConfig,
        "FCOS": C.FCOSConfig,
        "ATSS": C.ATSSConfig,
        "OTA": C.OTAConfig,
        "FreeAnchor": C.FreeAnchorConfig,
        "FasterRCNN": C.FasterRCNNConfig,
        "YOLOX": C.YOLOXConfig,
        "YOLOv3": C.YOLOv3Config,
        "CenterNet": C.CenterNetConfig,
        "DETR": C.DETRConfig,
    }


@pytest.mark.parametrize("name", list(_configs()))
def test_model_losses_and_inference(name):
    cfg = _small(_configs()[name]())
    model = cfg.build_model()
    batch = DummyLoader(
        batch_size=2, image_size=(96, 96), max_instances=6
    ).make_batch()
    variables = model.init_variables(jax.random.PRNGKey(0), image_size=(96, 96))
    total, losses, _ = model.get_losses_jit(variables, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(total)), f"{name} loss not finite"
    assert "total_loss" in losses
    dets = model.inference_jit(variables, batch)
    assert dets["boxes"].shape[0] == 2
    assert np.isfinite(np.asarray(dets["boxes"])).all()


def test_all_registered_models_build():
    """Every registered model constructs from its config
    (reference tests/models/test_build_model.py)."""
    from basedet_tpu.utils import all_register, registers

    all_register()
    for name in _configs():
        key = {"FasterRCNN": "FasterRCNN"}.get(name, name)
        assert key in registers.models, f"{key} not registered"


def test_detr_trainable_bn_threads_batch_stats():
    """Regression: DETR.get_losses must pass mutable=["batch_stats"] when
    the backbone uses trainable BN (sanity_e2e sets BACKBONE.NORM="BN";
    FrozenBN default hid the missing plumb — r4)."""
    from basedet_tpu import configs as C

    cfg = _small(C.DETRConfig())
    cfg.MODEL.BACKBONE.NORM = "BN"
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    model = cfg.build_model()
    batch = DummyLoader(
        batch_size=2, image_size=(96, 96), max_instances=6
    ).make_batch()
    variables = model.init_variables(jax.random.PRNGKey(0), image_size=(96, 96))
    assert "batch_stats" in variables
    total, losses, new_state = model.get_losses_jit(
        variables, batch, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(total))
    assert "batch_stats" in new_state  # running stats actually updated
