"""External-zoo backbone adapter tests (reference basecls_adaptor.py:12-211
analogue — here wrapping transformers Flax vision models)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

from basedet_tpu.layers.backbone.hf_adaptor import (  # noqa: E402
    HFBackboneAdapter,
    auto_convert_cfg_to_hf,
    get_channel_setting,
    get_feature_setting,
)


def test_adapter_feature_pyramid():
    m = HFBackboneAdapter(
        name_or_cfg="resnet18", out_features=("res3", "res4", "res5")
    )
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    # NHWC at strides 8/16/32 with the zoo's channel table
    assert out["res3"].shape == (1, 8, 8, 128)
    assert out["res4"].shape == (1, 4, 4, 256)
    assert out["res5"].shape == (1, 2, 2, 512)


def test_channel_tables_match_reference():
    # values from reference basecls_adaptor.py:64-122 for shared names
    assert get_channel_setting("resnet18") == (128, 256, 512)
    assert get_channel_setting("resnet50") == (512, 1024, 2048)
    assert get_channel_setting("regnety_016") == (120, 336, 888)
    assert get_channel_setting("regnetx_040") == (240, 560, 1360)
    assert get_feature_setting("resnet50") == ("res3", "res4", "res5")


def test_auto_convert_and_detector_end_to_end():
    from basedet_tpu.configs import RetinaNetConfig
    from basedet_tpu.utils.dummy import DummyLoader

    cfg = RetinaNetConfig()
    auto_convert_cfg_to_hf(cfg, "resnet18")
    assert cfg.MODEL.BACKBONE.NAME == "hf_resnet18"
    model = cfg.build_model()
    variables = model.init_variables(jax.random.PRNGKey(0), image_size=(64, 64))
    batch = DummyLoader(batch_size=1, image_size=(64, 64), max_instances=4).make_batch()
    total, losses, _ = model.get_losses(variables, batch)
    assert np.isfinite(float(total))
    dets = model.inference(variables, batch)
    assert dets["boxes"].shape[0] == 1
