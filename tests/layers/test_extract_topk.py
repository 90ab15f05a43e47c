"""extract_topk_mask / onehot gather helpers vs their naive counterparts."""
import jax
import jax.numpy as jnp
import numpy as np

from basedet_tpu.layers.common.function import (
    extract_topk_mask,
    onehot_gather_rows,
    onehot_pick_per_column,
)


def test_extract_topk_matches_lax_topk():
    rng = np.random.RandomState(0)
    vals = jnp.asarray(rng.randn(7, 123).astype(np.float32))
    for k in (1, 5, 10):
        tops, mask = extract_topk_mask(vals, k)
        ref_v, ref_i = jax.lax.top_k(vals, k)
        np.testing.assert_array_equal(np.asarray(tops), np.asarray(ref_v))
        ref_mask = np.zeros((7, 123), bool)
        np.put_along_axis(ref_mask, np.asarray(ref_i), True, axis=1)
        np.testing.assert_array_equal(np.asarray(mask), ref_mask)
        assert int(mask.sum()) == 7 * k


def test_extract_topk_ties_lowest_index():
    vals = jnp.asarray([[1.0, 3.0, 3.0, 0.0, 3.0]])
    tops, mask = extract_topk_mask(vals, 2)
    np.testing.assert_array_equal(np.asarray(tops), [[3.0, 3.0]])
    np.testing.assert_array_equal(np.asarray(mask), [[False, True, True, False, False]])


def test_onehot_gather_rows_exact():
    rng = np.random.RandomState(1)
    table = jnp.asarray(rng.randn(50, 5).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 50, size=(8400,)))
    out = onehot_gather_rows(table, idx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(table)[np.asarray(idx)])


def test_onehot_gather_rows_big_ints_and_coords():
    # Labels > 256 (Objects365 is 365-class) and box coords > 512 quantize
    # under default TPU matmul precision, which rounds f32 *inputs* to bf16.
    # onehot_gather_rows pins Precision.HIGHEST so these stay bit-exact on
    # every backend; this encodes that contract (reproduces on TPU, passes
    # trivially on f32 CPU).
    table = np.zeros((400, 5), np.float32)
    table[:, 4] = np.arange(400)           # integer class labels 0..399
    table[:, 0] = 639.0 - np.arange(400) * 0.25   # coords near 640
    idx = jnp.asarray(np.arange(400)[::-1].copy())
    out = np.asarray(onehot_gather_rows(jnp.asarray(table), idx))
    np.testing.assert_array_equal(out, table[::-1])


def test_onehot_pick_per_column_exact():
    rng = np.random.RandomState(2)
    mat = jnp.asarray(rng.randn(50, 840).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 50, size=(840,)))
    out = onehot_pick_per_column(mat, idx)
    ref = np.asarray(mat)[np.asarray(idx), np.arange(840)]
    np.testing.assert_array_equal(np.asarray(out), ref)
    # vector rows variant (K, R, D)
    mat3 = jnp.asarray(rng.randn(50, 840, 4).astype(np.float32))
    out3 = onehot_pick_per_column(mat3, idx)
    ref3 = np.asarray(mat3)[np.asarray(idx), np.arange(840)]
    np.testing.assert_array_equal(np.asarray(out3), ref3)
