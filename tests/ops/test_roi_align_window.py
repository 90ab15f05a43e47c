"""RoIAlign v3 (window kernel) equality vs the separable oracle, interpret
mode. Covers: mixed-level random rois, spatially clustered + scattered
groups, pathological aspect ratios that overflow the window (dense
fallback must make the result exact), padding rois, and dF grads."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import basedet_tpu.ops.roi_align_window as raw
from basedet_tpu.ops.roi_align_separable import multilevel_roi_align_batched

STRIDES = (4, 8, 16, 32)
IMG = 128
C = 8
B = 2


@pytest.fixture(autouse=True)
def small_windows(monkeypatch):
    # shrink windows so the finest level (H=32) is genuinely windowed and
    # coverage/overflow logic is exercised at test sizes
    monkeypatch.setattr(raw, "_HW", 16)
    monkeypatch.setattr(raw, "_WW", 16)


def make_feats(rng):
    return [
        jnp.asarray(rng.randn(B, IMG // s, IMG // s, C).astype(np.float32))
        for s in STRIDES
    ]


def rois_random(rng, R, lo=4, hi=110):
    sa = np.exp(rng.uniform(np.log(lo), np.log(hi), (B, R)))
    ar = np.exp(rng.uniform(np.log(0.5), np.log(2.0), (B, R)))
    w, h = sa * np.sqrt(ar), sa / np.sqrt(ar)
    cx = rng.uniform(0, IMG, (B, R))
    cy = rng.uniform(0, IMG, (B, R))
    x1 = np.clip(cx - w / 2, 0, IMG - 2)
    y1 = np.clip(cy - h / 2, 0, IMG - 2)
    x2 = np.clip(cx + w / 2, x1 + 1, IMG)
    y2 = np.clip(cy + h / 2, y1 + 1, IMG)
    return jnp.asarray(np.stack([x1, y1, x2, y2], -1).astype(np.float32))


def _check(feats, rois, atol=2e-5):
    got = raw.pool_rois_window(feats, rois, STRIDES, (7, 7), interpret=True)
    want = multilevel_roi_align_batched(list(feats), rois, STRIDES, (7, 7))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=atol, rtol=1e-5
    )


def test_mixed_levels_random():
    rng = np.random.RandomState(0)
    _check(make_feats(rng), rois_random(rng, 16))


def test_roi_count_not_group_multiple():
    rng = np.random.RandomState(1)
    _check(make_feats(rng), rois_random(rng, 13))


def test_pathological_aspect_overflows_window():
    """Full-height slivers: small area (assigned P2) but y-span >> window —
    must be exact via the dense fallback."""
    rng = np.random.RandomState(2)
    feats = make_feats(rng)
    r = np.asarray(rois_random(rng, 16)).copy()
    r[:, :6, 1] = 0.0
    r[:, :6, 3] = IMG - 1.0  # tall
    r[:, :6, 0] = np.arange(6)[None] * 9.0
    r[:, :6, 2] = r[:, :6, 0] + 3.0  # thin -> tiny area -> P2
    _check(feats, jnp.asarray(r.astype(np.float32)))


def test_zero_area_padding_rois():
    rng = np.random.RandomState(3)
    feats = make_feats(rng)
    r = np.asarray(rois_random(rng, 16)).copy()
    r[:, 10:] = 0.0
    got = raw.pool_rois_window(
        feats, jnp.asarray(r[:, :10].astype(np.float32)), STRIDES, (7, 7),
        interpret=True,
    )  # entry pads 10 -> 16 internally
    want = multilevel_roi_align_batched(
        list(feats), jnp.asarray(r[:, :10].astype(np.float32)),
        STRIDES, (7, 7),
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )


def test_grads_match_oracle():
    rng = np.random.RandomState(4)
    feats = make_feats(rng)
    rois = rois_random(rng, 16)
    gw = jnp.asarray(rng.randn(B, 16, 7, 7, C).astype(np.float32))

    def loss_v3(fs):
        out = raw.pool_rois_window(fs, rois, STRIDES, (7, 7), interpret=True)
        return jnp.sum(out * gw)

    def loss_oracle(fs):
        out = multilevel_roi_align_batched(list(fs), rois, STRIDES, (7, 7))
        return jnp.sum(out * gw)

    g3 = jax.grad(loss_v3)(tuple(feats))
    go = jax.grad(loss_oracle)(tuple(feats))
    for a, b in zip(g3, go):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, rtol=1e-4
        )


def test_grads_with_overflow_groups():
    rng = np.random.RandomState(5)
    feats = make_feats(rng)
    r = np.asarray(rois_random(rng, 16)).copy()
    r[:, :4, 1] = 0.0
    r[:, :4, 3] = IMG - 1.0
    r[:, :4, 0] = np.arange(4)[None] * 11.0
    r[:, :4, 2] = r[:, :4, 0] + 3.0
    rois = jnp.asarray(r.astype(np.float32))
    gw = jnp.asarray(rng.randn(B, 16, 7, 7, C).astype(np.float32))

    def loss_v3(fs):
        out = raw.pool_rois_window(fs, rois, STRIDES, (7, 7), interpret=True)
        return jnp.sum(out * gw)

    def loss_oracle(fs):
        out = multilevel_roi_align_batched(list(fs), rois, STRIDES, (7, 7))
        return jnp.sum(out * gw)

    g3 = jax.grad(loss_v3)(tuple(feats))
    go = jax.grad(loss_oracle)(tuple(feats))
    for a, b in zip(g3, go):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, rtol=1e-4
        )


def test_window_start_alignment():
    s = raw._window_start(
        jnp.asarray([3, 30, 0]), jnp.asarray([12, 31, 31]), 16, 32
    )
    s = np.asarray(s)
    assert (s % 8 == 0).all()
    assert (s >= 0).all() and (s <= 16).all()


def test_morton_locality():
    m = raw._morton16(jnp.asarray([0, 0, 1, 255]), jnp.asarray([0, 1, 0, 255]))
    assert list(np.asarray(m)[:3]) == [0, 1, 2]
    assert int(np.asarray(m)[3]) == 65535


def test_group16_matches_oracle(monkeypatch):
    """G is a tunable (G=16 halves grid steps); dense-fallback masks must
    re-granulate to the v2 kernels' own group size."""
    monkeypatch.setattr(raw, "_G", 16)
    rng = np.random.RandomState(6)
    feats = make_feats(rng)
    r = np.asarray(rois_random(rng, 32)).copy()
    r[:, :4, 1] = 0.0
    r[:, :4, 3] = IMG - 1.0
    r[:, :4, 0] = np.arange(4)[None] * 11.0
    r[:, :4, 2] = r[:, :4, 0] + 3.0  # overflow rois
    rois = jnp.asarray(r.astype(np.float32))
    _check(feats, rois)

    gw = jnp.asarray(rng.randn(B, 32, 7, 7, C).astype(np.float32))

    def loss_v3(fs):
        out = raw.pool_rois_window(fs, rois, STRIDES, (7, 7), interpret=True)
        return jnp.sum(out * gw)

    def loss_oracle(fs):
        out = multilevel_roi_align_batched(list(fs), rois, STRIDES, (7, 7))
        return jnp.sum(out * gw)

    g3 = jax.grad(loss_v3)(tuple(feats))
    go = jax.grad(loss_oracle)(tuple(feats))
    for a, b in zip(g3, go):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, rtol=1e-4
        )
