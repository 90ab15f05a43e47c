"""Pallas dynamic-k matching kernel (interpret mode) vs the XLA scan
formulation and a naive numpy oracle."""
import jax.numpy as jnp
import numpy as np

from basedet_tpu.layers.common.matcher import topk_dynamic_k_matching
from basedet_tpu.ops.matching_pallas import dynamic_k_matching_pallas


def _naive(cost, ious, valid, k):
    """Reference dynamic-k matching (per-GT python loop, iterative order)."""
    K, M = cost.shape
    matching = np.zeros((K, M), bool)
    for g in range(K):
        if not valid[g]:
            continue
        dk = int(np.clip(np.sort(ious[g])[::-1][:k].sum(), 1, k))
        order = np.argsort(cost[g], kind="stable")[:dk]
        matching[g, order] = True
    best = np.zeros(M, np.int32)
    fg = matching.any(axis=0)
    for a in np.where(fg)[0]:
        rows = np.where(matching[:, a])[0]
        best[a] = rows[np.argmin(cost[rows, a])]
    return best, fg


def _case(seed, K=13, M=257, k=10):
    rng = np.random.RandomState(seed)
    cost = rng.rand(K, M).astype(np.float32) * 10
    ious = np.clip(rng.rand(K, M).astype(np.float32) * 1.2 - 0.1, 0, 1)
    valid = np.arange(K) < rng.randint(1, K + 1)
    cost = cost + 1e9 * (~valid[:, None])
    ious = ious * valid[:, None]
    return cost, ious, valid, k


def test_kernel_matches_scan_and_oracle():
    for seed in range(5):
        cost, ious, valid, k = _case(seed)
        best_p, fg_p = dynamic_k_matching_pallas(
            jnp.asarray(cost)[None], jnp.asarray(ious)[None],
            jnp.asarray(valid)[None], k_cap=k, interpret=True,
        )
        best_s, fg_s = topk_dynamic_k_matching(
            jnp.asarray(cost), jnp.asarray(ious), jnp.asarray(valid),
            candidate_topk=k,
        )
        np.testing.assert_array_equal(np.asarray(fg_p[0]), np.asarray(fg_s))
        # matched gt only meaningful where fg
        fg = np.asarray(fg_s)
        np.testing.assert_array_equal(
            np.asarray(best_p[0])[fg], np.asarray(best_s)[fg]
        )
        best_n, fg_n = _naive(cost, ious, valid, k)
        np.testing.assert_array_equal(fg_n, np.asarray(fg_s))
        np.testing.assert_array_equal(best_n[fg_n], np.asarray(best_s)[fg])


def test_kernel_batched():
    costs, iouss, valids = [], [], []
    for seed in (10, 11, 12):
        c, i, v, k = _case(seed, K=8, M=130, k=5)
        costs.append(c); iouss.append(i); valids.append(v)
    best, fg = dynamic_k_matching_pallas(
        jnp.asarray(np.stack(costs)), jnp.asarray(np.stack(iouss)),
        jnp.asarray(np.stack(valids)), k_cap=5, interpret=True,
    )
    for b in range(3):
        bn, fn = _naive(costs[b], iouss[b], valids[b], 5)
        np.testing.assert_array_equal(fn, np.asarray(fg[b]))
        np.testing.assert_array_equal(bn[fn], np.asarray(best[b])[fn])
