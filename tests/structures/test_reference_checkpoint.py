"""End-to-end converter validation against a synthetic checkpoint with the
EXACT reference RetinaNet-R50 state-dict layout: param names transcribed from
/root/reference/basedet/models/cls/resnet.py:116-258 (trunk),
layers/backbone/fpn_backbone.py:87-99 (FPN conv naming + top block) and
layers/head/retina_head.py:44-70 (share_param head), with MegEngine's
(1, C, 1, 1) BatchNorm parameter shapes. Every model param must load
(strict), no checkpoint key may go unused, and representative values must
land in the right flax leaves with the right layout transform."""
import jax
import numpy as np
import pytest

from basedet_tpu.configs import RetinaNetConfig
from basedet_tpu.utils.checkpoint import flatten_tree
from basedet_tpu.utils.convert_weights import (
    convert_reference_detector_state,
)
from basedet_tpu.utils.checkpoint import load_matched_weights

from basedet_tpu.utils.reference_layout import (  # noqa: F401
    R50_STAGES,
    reference_retinanet_r50_state,
)


@pytest.fixture(scope="module")
def loaded():
    cfg = RetinaNetConfig()  # resnet50 default — the parity config
    model = cfg.build_model()
    variables = model.init_variables(jax.random.PRNGKey(0), image_size=(64, 64))
    state = reference_retinanet_r50_state()
    converted = convert_reference_detector_state(state)
    tree, stats = load_matched_weights(
        variables, converted, strict=True, return_stats=True
    )
    return state, tree, stats


def test_all_params_matched_and_no_leftovers(loaded):
    state, tree, stats = loaded
    assert stats["missing"] == []
    assert stats["unused"] == []
    assert stats["matched"] == len(flatten_tree(tree))


def test_value_placement_and_layout(loaded):
    state, tree, _ = loaded
    flat = flatten_tree(tree)

    def val(ref_key):
        return float(state[ref_key].reshape(-1)[0])

    # conv OIHW → HWIO transpose
    k = np.asarray(flat["params/bottom_up/conv1/kernel"])
    assert k.shape == (7, 7, 3, 64)
    assert k[0, 0, 0, 0] == val("backbone.bottom_up.conv1.weight")
    # stage-block Sequential flattening + downsample conv
    assert (
        np.asarray(flat["params/bottom_up/layer3_0/downsample_conv/kernel"])[0, 0, 0, 0]
        == val("backbone.bottom_up.layer3.0.downsample.0.weight")
    )
    # BN mapping: bn2 → FrozenBatchNorm_1, (1,C,1,1) reshaped to (C,)
    b = np.asarray(flat["frozen/bottom_up/layer2_1/FrozenBatchNorm_1/mean"])
    assert b.shape == (128,)
    assert b[0] == val("backbone.bottom_up.layer2.1.bn2.running_mean")
    # downsample BN → FrozenBatchNorm_3 in Bottleneck blocks
    assert (
        np.asarray(flat["frozen/bottom_up/layer4_0/FrozenBatchNorm_3/var"])[0]
        == val("backbone.bottom_up.layer4.0.downsample.1.running_var")
    )
    # FPN renames incl. top block
    assert (
        np.asarray(flat["params/fpn/fpn_lateral_res4/kernel"])[0, 0, 0, 0]
        == val("backbone.fpn_lateral4.weight")
    )
    assert (
        np.asarray(flat["params/fpn/fpn_p6/bias"])[0]
        == val("backbone.top_block.p6.bias")
    )
    # head Sequential indices + predictors
    assert (
        np.asarray(flat["params/head/cls_subnet_2/kernel"])[0, 0, 0, 0]
        == val("head.cls_subnet.2.weight")
    )
    assert (
        np.asarray(flat["params/head/bbox_pred/bias"])[0]
        == val("head.bbox_pred.bias")
    )


def test_centernet_deconv_transpose_layout():
    """ConvTranspose2d weights are (Ci, Co, kh, kw), not OIHW; with the
    square-channel CenterNet deconvs (Ci == Co) the wrong transpose would
    load silently with I/O swapped. The converter must use (2, 3, 0, 1)
    for up_sample keys (reference layers/head/center_head.py:33)."""
    ci = co = 4
    w = np.arange(ci * co * 4 * 4, dtype=np.float32).reshape(ci, co, 4, 4)
    state = {
        "upsample.deconv1.up_sample.weight": w,
        # a plain conv of the same shape must still take the OIHW branch
        "upsample.deconv1.dcn.weight": w.copy(),
    }
    converted = convert_reference_detector_state(state)
    got_deconv = converted["upsample/deconv1/up_sample/kernel"]
    got_conv = converted["upsample/deconv1/dcn/kernel"]
    np.testing.assert_array_equal(got_deconv, w.transpose(2, 3, 0, 1))
    np.testing.assert_array_equal(got_conv, w.transpose(2, 3, 1, 0))
    assert not np.array_equal(got_deconv, got_conv)
