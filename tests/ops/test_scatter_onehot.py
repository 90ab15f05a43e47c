"""One-hot-matmul row-scatter (DCN dF path) vs the XLA scatter-add oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basedet_tpu.ops.scatter_onehot import (
    gather_rows_batched,
    gather_rows_st,
    scatter_rows_onehot,
    scatter_rows_onehot_pallas,
)


def _case(rng, n, r, d):
    idx = jnp.asarray(rng.randint(0, r, (n,)).astype(np.int32))
    vals = jnp.asarray(rng.randn(n, d).astype(np.float32))
    return idx, vals


def test_scatter_matches_oracle():
    rng = np.random.RandomState(0)
    for n, r, d in ((100, 17, 8), (2048, 441, 16), (5000, 300, 32)):
        idx, vals = _case(rng, n, r, d)
        got = scatter_rows_onehot(idx, vals, r)
        want = jnp.zeros((r, d), jnp.float32).at[idx].add(vals)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )


def test_scatter_chunk_padding_inert():
    # N not a multiple of the chunk: padded rows must contribute nothing
    rng = np.random.RandomState(1)
    idx, vals = _case(rng, 2049, 50, 4)
    got = scatter_rows_onehot(idx, vals, 50)
    want = jnp.zeros((50, 4), jnp.float32).at[idx].add(vals)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_gather_forward_exact():
    rng = np.random.RandomState(2)
    table = jnp.asarray(rng.randn(100, 8).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 100, (333,)).astype(np.int32))
    np.testing.assert_array_equal(
        np.asarray(gather_rows_st(table, idx)), np.asarray(table[idx])
    )


@pytest.mark.parametrize("backend", ["onehot", "xla"])
def test_gather_grad_matches_plain_gather(monkeypatch, backend):
    monkeypatch.setenv("BASEDET_DCN_SCATTER", backend)
    rng = np.random.RandomState(3)
    table = jnp.asarray(rng.randn(64, 8).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 64, (500,)).astype(np.int32))
    cot = jnp.asarray(rng.randn(500, 8).astype(np.float32))

    def loss(t):
        return jnp.sum(gather_rows_st(t, idx) * cot)

    def loss_ref(t):
        return jnp.sum(t[idx] * cot)

    got = jax.grad(loss)(table)
    want = jax.grad(loss_ref)(table)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_gather_grad_under_vmap_and_jit(monkeypatch):
    monkeypatch.setenv("BASEDET_DCN_SCATTER", "onehot")
    rng = np.random.RandomState(4)
    tables = jnp.asarray(rng.randn(3, 40, 8).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 40, (3, 200)).astype(np.int32))
    cot = jnp.asarray(rng.randn(3, 200, 8).astype(np.float32))

    def loss(ts):
        out = jax.vmap(gather_rows_st)(ts, idx)
        return jnp.sum(out * cot)

    def loss_ref(ts):
        out = jax.vmap(lambda t, i: t[i])(ts, idx)
        return jnp.sum(out * cot)

    got = jax.jit(jax.grad(loss))(tables)
    want = jax.grad(loss_ref)(tables)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_scatter_pallas_matches_oracle_interpret():
    # batched Pallas kernel (interpret mode on CPU) vs the scatter oracle,
    # incl. shapes forcing row-block/chunk padding and D tiling
    rng = np.random.RandomState(6)
    for b, n, r, d in ((2, 300, 441, 128), (1, 2048, 600, 256),
                       (3, 513, 6561, 128)):
        idx = jnp.asarray(rng.randint(0, r, (b, n)).astype(np.int32))
        vals = jnp.asarray(rng.randn(b, n, d).astype(np.float32))
        got = scatter_rows_onehot_pallas(idx, vals, r, interpret=True)
        want = jax.vmap(
            lambda i, v: jnp.zeros((r, d), jnp.float32).at[i].add(v)
        )(idx, vals)
        assert got.shape == (b, r, d)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
        )


def test_scatter_pallas_out_of_range_inert():
    # caller pad convention: idx == n_rows must contribute nothing
    rng = np.random.RandomState(7)
    idx = jnp.asarray(
        np.concatenate([rng.randint(0, 20, 30), np.full(10, 20)])
        .astype(np.int32)[None]
    )
    vals = jnp.asarray(rng.randn(1, 40, 128).astype(np.float32))
    got = scatter_rows_onehot_pallas(idx, vals, 20, interpret=True)
    want = jnp.zeros((20, 128), jnp.float32).at[idx[0, :30]].add(
        vals[0, :30]
    )
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(want), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("backend", ["onehot", "xla", "pallas"])
def test_gather_batched_grad_matches_plain(monkeypatch, backend):
    monkeypatch.setenv("BASEDET_DCN_SCATTER", backend)
    rng = np.random.RandomState(8)
    tables = jnp.asarray(rng.randn(2, 64, 128).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 64, (2, 500)).astype(np.int32))
    cot = jnp.asarray(rng.randn(2, 500, 128).astype(np.float32))

    def loss(ts):
        return jnp.sum(gather_rows_batched(ts, idx) * cot)

    def loss_ref(ts):
        return jnp.sum(
            jnp.take_along_axis(ts, idx[..., None], axis=1) * cot
        )

    got = jax.jit(jax.grad(loss))(tables)
    want = jax.grad(loss_ref)(tables)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
    )


def test_dcn_module_grads_backend_agnostic(monkeypatch):
    # the full ModulatedDeformConv: input+param grads must not depend on
    # the scatter backend (f32, CPU)
    from basedet_tpu.layers.blocks.deformable import ModulatedDeformConv

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 9, 9, 8).astype(np.float32))
    dcn = ModulatedDeformConv(4)
    v = dcn.init(jax.random.PRNGKey(0), x)
    # non-zero offsets so samples leave the regular grid
    v = jax.tree_util.tree_map(
        lambda a: a + 0.3 if a.ndim == 1 else a, v
    )

    def loss(v, x):
        return jnp.sum(dcn.apply(v, x) ** 2)

    grads = {}
    for backend in ("onehot", "xla"):
        monkeypatch.setenv("BASEDET_DCN_SCATTER", backend)
        grads[backend] = jax.grad(loss, argnums=(0, 1))(v, x)
    for a, b in zip(
        jax.tree_util.tree_leaves(grads["onehot"]),
        jax.tree_util.tree_leaves(grads["xla"]),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )
