"""fused_gemm_stats (Pallas, interpret mode) vs the jnp oracle —
values and gradients, incl. the raw-sum prologue (shortcut) and
multi-term (concat) forms, and the differentiable BN-stat glue."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basedet_tpu.ops.fused_bn import (
    fused_gemm_stats,
    fused_gemm_stats_oracle,
    moments_to_affine,
    stats_to_moments,
)

M, K, N = 256, 32, 64


def _rand(rng, shape, dtype=jnp.bfloat16, scale=1.0):
    return jnp.asarray(rng.randn(*shape) * scale, dtype)


def _mk_terms(rng, spec):
    terms = []
    for s in spec:
        if s == "act":
            terms.append(
                ("act", _rand(rng, (M, K)), _rand(rng, (K, N), scale=0.3))
            )
        else:  # int = number of raw inputs
            raws = [
                (
                    _rand(rng, (M, K)),
                    jnp.asarray(rng.rand(K) + 0.5, jnp.float32),
                    jnp.asarray(rng.randn(K) * 0.1, jnp.float32),
                )
                for _ in range(s)
            ]
            terms.append(("raw", raws, _rand(rng, (K, N), scale=0.3)))
    return terms


@pytest.mark.parametrize("spec", [("act",), (1,), (2,), ("act", 1), (1, 1)])
def test_forward_matches_oracle(spec):
    rng = np.random.RandomState(0)
    terms = _mk_terms(rng, spec)
    y, s, ss = fused_gemm_stats(terms, interpret=True)
    yo, so, sso = fused_gemm_stats_oracle(terms)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(yo))
    np.testing.assert_allclose(np.asarray(s), np.asarray(so), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ss), np.asarray(sso), rtol=1e-5)


def _split_arrays(terms):
    """terms -> (arrays pytree, rebuild fn) so jax.grad sees only arrays."""
    arrays = []
    for t in terms:
        if t[0] == "act":
            arrays.append((t[1], t[2]))
        else:
            arrays.append(([list(r) for r in t[1]], t[2]))

    kinds = [t[0] for t in terms]

    def rebuild(arrays):
        out = []
        for kind, a in zip(kinds, arrays):
            if kind == "act":
                out.append(("act", a[0], a[1]))
            else:
                out.append(("raw", [tuple(r) for r in a[0]], a[1]))
        return out

    return arrays, rebuild


@pytest.mark.parametrize("spec", [("act",), (2,), ("act", 1)])
def test_grads_match_oracle(spec):
    rng = np.random.RandomState(1)
    terms = _mk_terms(rng, spec)
    arrays, rebuild = _split_arrays(terms)

    def loss(fn, arrays):
        y, s, ss = fn(rebuild(arrays))
        # touch all three outputs, including stats (the BN-backward path)
        return (
            jnp.sum(y.astype(jnp.float32) * 0.01)
            + jnp.sum(jnp.sin(s * 0.001))
            + jnp.sum(jnp.cos(ss * 0.0001))
        )

    g_pallas = jax.grad(
        lambda t: loss(lambda tt: fused_gemm_stats(tt, interpret=True), t)
    )(arrays)
    g_oracle = jax.grad(lambda t: loss(fused_gemm_stats_oracle, t))(arrays)

    flat_p, _ = jax.tree_util.tree_flatten(g_pallas)
    flat_o, _ = jax.tree_util.tree_flatten(g_oracle)
    assert len(flat_p) == len(flat_o)
    for a, b in zip(flat_p, flat_o):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        denom = max(1e-3, float(np.abs(b).max()))
        np.testing.assert_allclose(
            a / denom, b / denom, atol=3e-2,
            err_msg=f"shapes {a.shape} vs {b.shape}",
        )


def test_chain_matches_flax_conv_bn_silu():
    """A 2-deep raw chain == conv1x1→BN(train)→SiLU→conv1x1→BN→SiLU
    computed the classic way (stats on the bf16 conv output, f32 math)."""
    rng = np.random.RandomState(2)
    x = _rand(rng, (M, K))
    w1 = _rand(rng, (K, N), scale=0.3)
    w2 = _rand(rng, (N, K), scale=0.3)
    g1 = jnp.asarray(rng.rand(N) + 0.5, jnp.float32)
    b1 = jnp.asarray(rng.randn(N) * 0.1, jnp.float32)
    eps = 1e-3

    # fused chain
    y1, s1, ss1 = fused_gemm_stats([("act", x, w1)], interpret=True)
    mean1, var1 = stats_to_moments(s1, ss1, M)
    sc1, sh1 = moments_to_affine(mean1, var1, g1, b1, eps)
    y2, s2, ss2 = fused_gemm_stats(
        [("raw", [(y1, sc1, sh1)], w2)], interpret=True
    )

    # classic
    y1c = jnp.dot(x, w1, preferred_element_type=jnp.float32).astype(
        jnp.bfloat16
    )
    y1f = y1c.astype(jnp.float32)
    mu = jnp.mean(y1f, axis=0)
    var = jnp.mean((y1f - mu) ** 2, axis=0)
    xhat = (y1f - mu) * jax.lax.rsqrt(var + eps) * g1 + b1
    a = (xhat * jax.nn.sigmoid(xhat)).astype(jnp.bfloat16)
    y2c = jnp.dot(a, w2, preferred_element_type=jnp.float32).astype(
        jnp.bfloat16
    )

    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y1c))
    # mean/var path differs (sum-of-squares vs centered) -> tiny fp drift
    np.testing.assert_allclose(
        np.asarray(y2, np.float32), np.asarray(y2c, np.float32),
        atol=0.05, rtol=0.05,
    )


def test_odd_m_tile():
    """M not divisible by the default tile still works (tile shrink)."""
    rng = np.random.RandomState(3)
    x = _rand(rng, (M // 2, K))
    w = _rand(rng, (K, N), scale=0.3)
    y, s, ss = fused_gemm_stats([("act", x, w)], interpret=True)
    yo, so, _ = fused_gemm_stats_oracle([("act", x, w)])
    np.testing.assert_array_equal(np.asarray(y), np.asarray(yo))
    np.testing.assert_allclose(np.asarray(s), np.asarray(so), rtol=1e-5)
