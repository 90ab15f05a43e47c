"""Sub-pixel stride-2 deconv == torch ConvTranspose2d(k4, s2, p1)."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from basedet_tpu.ops.subpixel import (
    SubpixelConvTranspose2x,
    conv_transpose_s2_subpixel,
)


def _torch_ref(x_nhwc: np.ndarray, w_hwio: np.ndarray) -> np.ndarray:
    xt = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
    wt = torch.from_numpy(np.transpose(w_hwio, (2, 3, 0, 1)))  # (Ci, Co, k, k)
    y = F.conv_transpose2d(xt, wt, stride=2, padding=1)
    return np.transpose(y.numpy(), (0, 2, 3, 1))


def test_matches_torch_conv_transpose2d():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 9, 11, 6).astype(np.float32)
    w = rng.randn(4, 4, 6, 5).astype(np.float32)
    ref = _torch_ref(x, w)
    out = conv_transpose_s2_subpixel(jnp.asarray(x), jnp.asarray(w))
    assert out.shape == ref.shape == (2, 18, 22, 5)  # 2H, torch parity
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_module_param_tree_and_output():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 8, 8, 4).astype(np.float32)
    mod = SubpixelConvTranspose2x(5)
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    assert v["params"]["kernel"].shape == (4, 4, 4, 5)  # flax HWIO layout
    out = mod.apply(v, jnp.asarray(x))
    ref = _torch_ref(x, np.asarray(v["params"]["kernel"]))
    assert out.shape == (1, 16, 16, 5)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_gradients_match_torch():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 6, 6, 3).astype(np.float32)
    w = rng.randn(4, 4, 3, 2).astype(np.float32)

    gx_s, gw_s = jax.grad(
        lambda x_, w_: jnp.sum(conv_transpose_s2_subpixel(x_, w_) ** 2),
        argnums=(0, 1),
    )(jnp.asarray(x), jnp.asarray(w))

    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2))).requires_grad_()
    wt = torch.from_numpy(np.transpose(w, (2, 3, 0, 1))).requires_grad_()
    (F.conv_transpose2d(xt, wt, stride=2, padding=1) ** 2).sum().backward()
    gx_r = np.transpose(xt.grad.numpy(), (0, 2, 3, 1))
    gw_r = np.transpose(wt.grad.numpy(), (2, 3, 0, 1))
    np.testing.assert_allclose(np.asarray(gx_s), gx_r, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_s), gw_r, atol=1e-3)
