"""Verify the O(K·R) closed-form assignment costs against the explicit
(K, R, C) formulations they replace (YOLOX SimOTA BCE cost, OTA focal cost)."""
import jax
import jax.numpy as jnp
import numpy as np


def test_yolox_onehot_bce_cost_closed_form():
    """cls_cost = Σ_c BCE(p_c, onehot_y_c) must equal s0 + log(1-p_y) - log(p_y)."""
    rng = np.random.RandomState(0)
    K, R, C = 5, 13, 7
    p = jax.nn.sigmoid(jnp.asarray(rng.randn(R, C), jnp.float32))
    sqrt_p = jnp.sqrt(p * jax.nn.sigmoid(jnp.asarray(rng.randn(R, 1), jnp.float32)))
    labels = jnp.asarray(rng.randint(0, C, K))

    # explicit: BCE(sqrt_p, onehot) summed over classes (reference yolox.py:304-331)
    onehot = jax.nn.one_hot(labels, C)  # (K, C)
    eps = 1e-8
    pb = jnp.clip(sqrt_p, eps, 1 - eps)
    bce = -(
        onehot[:, None, :] * jnp.log(pb)[None]
        + (1 - onehot[:, None, :]) * jnp.log(1 - pb)[None]
    ).sum(-1)  # (K, R)

    # closed form used in models/det/yolox.py
    s0 = jnp.sum(-jnp.log(jnp.maximum(1 - sqrt_p, eps)), axis=-1)
    p_y = sqrt_p[:, labels].T
    closed = s0[None, :] + jnp.log(jnp.maximum(1 - p_y, eps)) - jnp.log(
        jnp.maximum(p_y, eps)
    )
    np.testing.assert_allclose(np.asarray(bce), np.asarray(closed), rtol=1e-4)


def test_ota_focal_cost_closed_form():
    """focal cost = Σ_c FL(logit_c, onehot_y_c) == s0 - FL(p_y,0) + FL(p_y,1)."""
    from basedet_tpu.layers.losses import sigmoid_focal_loss

    rng = np.random.RandomState(1)
    K, R, C = 4, 9, 6
    alpha, gamma = 0.25, 2.0
    logits = jnp.asarray(rng.randn(R, C), jnp.float32)
    labels = jnp.asarray(rng.randint(0, C, K))

    onehot = jax.nn.one_hot(labels, C)
    explicit = sigmoid_focal_loss(
        jnp.broadcast_to(logits[None], (K, R, C)),
        jnp.broadcast_to(onehot[:, None, :], (K, R, C)),
        alpha=alpha, gamma=gamma,
    ).sum(-1)

    p = jax.nn.sigmoid(logits)
    eps = 1e-12
    fl0 = -(1 - alpha) * (p ** gamma) * jnp.log(jnp.maximum(1 - p, eps))
    s0 = jnp.sum(fl0, axis=-1)
    p_y = p[:, labels].T
    fl1_y = -alpha * ((1 - p_y) ** gamma) * jnp.log(jnp.maximum(p_y, eps))
    fl0_y = -(1 - alpha) * (p_y ** gamma) * jnp.log(jnp.maximum(1 - p_y, eps))
    closed = s0[None, :] - fl0_y + fl1_y
    np.testing.assert_allclose(np.asarray(explicit), np.asarray(closed), rtol=1e-4)
