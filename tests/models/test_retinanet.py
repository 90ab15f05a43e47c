"""RetinaNet smoke tests (model: reference tests/models/test_retinanet.py —
loss + inference on synthetic DummyLoader batches)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basedet_tpu.utils.dummy import DummyLoader
from tests.tiny import tiny_retinanet_cfg


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_retinanet_cfg()
    model = cfg.build_model()
    variables = model.init_variables(jax.random.PRNGKey(0), image_size=(128, 128))
    batch = DummyLoader(batch_size=2, image_size=(128, 128), max_instances=8).make_batch()
    return model, variables, batch


def test_losses_finite(setup):
    model, variables, batch = setup
    total, losses, state = model.get_losses_jit(variables, batch)
    assert set(losses) == {"total_loss", "cls_loss", "reg_loss"}
    for v in losses.values():
        assert np.isfinite(float(v))
    assert float(total) > 0


def test_losses_grad_flows(setup):
    model, variables, batch = setup

    def loss_fn(params):
        v = {**variables, "params": params}
        total, _, _ = model.get_losses(v, batch)
        return total

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    gnorm = jnp.sqrt(
        sum(jnp.sum(g ** 2) for g in jax.tree_util.tree_leaves(grads))
    )
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0


def test_inference_shapes(setup):
    model, variables, batch = setup
    dets = model.inference_jit(variables, batch)
    B = batch["data"].shape[0]
    D = model.cfg.TEST.MAX_BOXES_PER_IMAGE
    assert dets["boxes"].shape == (B, D, 4)
    assert dets["box_scores"].shape == (B, D)
    assert dets["box_labels"].shape == (B, D)
    assert dets["valid"].shape == (B, D)
    # boxes inside original image bounds
    b = np.asarray(dets["boxes"])
    assert (b >= 0).all()
