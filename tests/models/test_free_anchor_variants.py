"""FreeAnchor bag-loss perf variants are exact rewrites.

The round-5 switches (BASEDET_FA_GATHER=flat, BASEDET_FA_NEG=sparse —
models/det/free_anchor.py) reformulate the matched-score gather and the
negative focal term; both must match the reference-shaped dense forms in
value AND gradient (the sparse correction is an algebraic identity:
sum f(s(1-bp)) = sum f(s) + sum over deduped nonzero bp of f(s(1-bp))-f(s)).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basedet_tpu.utils.dummy import DummyLoader
from tests.tiny import shrink as _small


def _loss_and_grad(model, variables, batch, gather, neg):
    old = {
        "BASEDET_FA_GATHER": os.environ.get("BASEDET_FA_GATHER"),
        "BASEDET_FA_NEG": os.environ.get("BASEDET_FA_NEG"),
    }
    os.environ["BASEDET_FA_GATHER"] = gather
    os.environ["BASEDET_FA_NEG"] = neg
    try:
        def f(params):
            v = {"params": params, **{
                k: vv for k, vv in variables.items() if k != "params"
            }}
            total, _, _ = model.get_losses(v, batch)
            return total

        val, grads = jax.value_and_grad(f)(variables["params"])
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    return float(val), grads


@pytest.fixture(scope="module")
def fa_setup():
    from basedet_tpu import configs as C

    cfg = _small(C.FreeAnchorConfig())
    model = cfg.build_model()
    batch = DummyLoader(
        batch_size=2, image_size=(96, 96), max_instances=6
    ).make_batch()
    variables = model.init_variables(
        jax.random.PRNGKey(0), image_size=(96, 96)
    )
    return model, variables, batch


def test_variants_match_dense_rows(fa_setup):
    model, variables, batch = fa_setup
    ref_val, ref_grads = _loss_and_grad(model, variables, batch,
                                        "rows", "dense")
    for gather, neg in (("flat", "dense"), ("rows", "sparse"),
                        ("flat", "sparse")):
        val, grads = _loss_and_grad(model, variables, batch, gather, neg)
        assert np.isclose(val, ref_val, rtol=1e-5, atol=1e-6), (
            gather, neg, val, ref_val
        )
        flat_r = jax.tree_util.tree_leaves(ref_grads)
        flat_v = jax.tree_util.tree_leaves(grads)
        for a, b in zip(flat_r, flat_v):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=2e-4, atol=1e-6,
                err_msg=f"grad mismatch under {gather}/{neg}",
            )


def test_duplicate_anchor_hits_dedup_by_max(fa_setup):
    """Crowded same-class gts force duplicate (anchor, class) hits: the
    sparse form's sort-dedup must reproduce the dense scatter-max."""
    model, variables, batch = fa_setup
    b = dict(batch)
    gt = np.asarray(b["gt_boxes"]).copy()
    # stack several near-identical same-class boxes: all their top-P
    # anchor sets overlap heavily
    gt[:, :4, :4] = np.array([10.0, 10.0, 60.0, 60.0]) + np.arange(
        4
    ).reshape(1, 4, 1)
    gt[:, :4, 4] = 1.0
    b["gt_boxes"] = jnp.asarray(gt)
    info = np.asarray(b["im_info"]).copy()
    info[:, 4] = 4
    b["im_info"] = jnp.asarray(info)

    ref_val, _ = _loss_and_grad(model, variables, b, "rows", "dense")
    val, _ = _loss_and_grad(model, variables, b, "flat", "sparse")
    assert np.isclose(val, ref_val, rtol=1e-5, atol=1e-6), (val, ref_val)
