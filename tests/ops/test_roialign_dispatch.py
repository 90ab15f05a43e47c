"""pool_rois_multilevel backend dispatch: forced Pallas paths must fail
loudly off-TPU (silently timing the XLA path as "pallas"/"window" would
corrupt A/Bs), and the unforced CPU path must be the separable oracle."""
import jax.numpy as jnp
import numpy as np
import pytest

from basedet_tpu.ops.roi_align_pallas import pool_rois_multilevel
from basedet_tpu.ops.roi_align_separable import multilevel_roi_align_batched

STRIDES = (4, 8)
B, R, C = 2, 6, 8


def _inputs():
    rng = np.random.RandomState(0)
    feats = [
        jnp.asarray(rng.randn(B, 32 // s, 32 // s, C).astype(np.float32))
        for s in STRIDES
    ]
    rois = jnp.asarray(
        np.stack(
            [
                rng.uniform(0, 12, (B, R)),
                rng.uniform(0, 12, (B, R)),
                rng.uniform(16, 31, (B, R)),
                rng.uniform(16, 31, (B, R)),
            ],
            -1,
        ).astype(np.float32)
    )
    return feats, rois


@pytest.mark.parametrize("force", ["pallas", "window"])
def test_forced_kernel_fails_loudly_off_tpu(monkeypatch, force):
    import jax

    if jax.default_backend() == "tpu":
        pytest.skip("guard only applies off-TPU")
    monkeypatch.setenv("BASEDET_ROIALIGN_BACKEND", force)
    feats, rois = _inputs()
    with pytest.raises(ValueError, match=force):
        pool_rois_multilevel(feats, rois, STRIDES, (3, 3))


def test_unforced_cpu_path_is_separable_oracle(monkeypatch):
    monkeypatch.delenv("BASEDET_ROIALIGN_BACKEND", raising=False)
    feats, rois = _inputs()
    got = pool_rois_multilevel(feats, rois, STRIDES, (3, 3))
    want = multilevel_roi_align_batched(list(feats), rois, STRIDES, (3, 3))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
