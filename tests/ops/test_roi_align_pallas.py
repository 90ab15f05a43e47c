"""Fused Pallas RoIAlign (interpret mode on CPU) vs the XLA separable
implementation — forward values and backward dF."""
import jax
import jax.numpy as jnp
import numpy as np

from basedet_tpu.ops.roi_align_separable import multilevel_roi_align_batched
from basedet_tpu.ops.roi_align_pallas import multilevel_roi_align_fused

STRIDES = (4, 8, 16, 32)


def _inputs(B=2, R=32, C=64, img=256, seed=0):
    rng = np.random.RandomState(seed)
    sizes = [(img // s, img // s) for s in STRIDES]
    feats = tuple(
        jnp.asarray(rng.randn(B, h, w, C).astype(np.float32))
        for h, w in sizes
    )
    xy = rng.rand(B, R, 2) * (img - 30)
    wh = rng.rand(B, R, 2) * (img / 2) + 4
    rois = jnp.asarray(
        np.concatenate([xy, np.minimum(xy + wh, img)], axis=-1).astype(
            np.float32
        )
    )
    return feats, rois


def test_fused_forward_matches_separable():
    feats, rois = _inputs()
    got = multilevel_roi_align_fused(
        feats, rois, STRIDES, (7, 7), interpret=True
    )
    ref = multilevel_roi_align_batched(list(feats), rois, STRIDES, (7, 7))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_fused_backward_matches_separable():
    feats, rois = _inputs(B=1, R=16, C=64, img=128, seed=1)
    w = jnp.asarray(
        np.random.RandomState(2).randn(1, 16, 7, 7, 64).astype(np.float32)
    )

    def loss_fused(fs):
        o = multilevel_roi_align_fused(fs, rois, STRIDES, (7, 7), interpret=True)
        return jnp.sum(o * w)

    def loss_ref(fs):
        o = multilevel_roi_align_batched(list(fs), rois, STRIDES, (7, 7))
        return jnp.sum(o * w)

    g_fused = jax.grad(loss_fused)(feats)
    g_ref = jax.grad(loss_ref)(feats)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


def test_uneven_h_chunking_matches(monkeypatch):
    """Non-power-of-two feature heights must still split under the VMEM
    budgets (uneven final chunk) with identical results — eval shortest-edge
    buckets produce e.g. P2 H=200 where halving stops at 25."""
    import basedet_tpu.ops.roi_align_pallas as rap

    feats, rois = _inputs(B=1, R=16, C=64, img=160, seed=4)  # H=40,20,10,5
    ref = multilevel_roi_align_batched(list(feats), rois, STRIDES, (7, 7))

    # budgets sized so level 0 (H=40, W=40, CT=64, G=8) chunks UNEVENLY:
    # fwd fixed cost ≈874k + 20480·h ≤ 950k → hs=3 → 13×3 + 1;
    # bwd acc h·40·64·4 ≤ 7·40·64·4 → hs=7 → 5×7 + 5.
    monkeypatch.setattr(rap, "_FWD_BUDGET", 950_000)
    monkeypatch.setattr(rap, "_ACC_BUDGET", 7 * 40 * 64 * 4)
    got = multilevel_roi_align_fused(feats, rois, STRIDES, (7, 7), interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
    )

    w = jnp.asarray(
        np.random.RandomState(5).randn(1, 16, 7, 7, 64).astype(np.float32)
    )
    g = jax.grad(
        lambda fs: jnp.sum(
            multilevel_roi_align_fused(fs, rois, STRIDES, (7, 7), interpret=True) * w
        )
    )(feats)
    g_ref = jax.grad(
        lambda fs: jnp.sum(
            multilevel_roi_align_batched(list(fs), rois, STRIDES, (7, 7)) * w
        )
    )(feats)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


def test_chunk_h_uneven():
    from basedet_tpu.ops.roi_align_pallas import _chunk_h

    assert _chunk_h(200, lambda h: h <= 200) == 200
    assert _chunk_h(200, lambda h: h <= 30) == 29  # ceil(200/7), uneven tail
    assert _chunk_h(50, lambda h: h <= 1) == 1
    assert _chunk_h(64, lambda h: h <= 16) == 16


def test_fused_rois_get_zero_grad():
    feats, rois = _inputs(B=1, R=16, C=64, img=128, seed=3)

    def loss(r):
        return jnp.sum(
            multilevel_roi_align_fused(feats, r, STRIDES, (7, 7), interpret=True)
        )

    dr = jax.grad(loss)(rois)
    assert float(jnp.max(jnp.abs(dr))) == 0.0
