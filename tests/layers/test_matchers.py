"""Matcher correctness: IoU matcher semantics, dynamic-k vs naive loop,
auction assignment vs scipy's Hungarian oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basedet_tpu.layers.common.matcher import (
    Matcher,
    hungarian_match_owner,
    sinkhorn_log,
    topk_dynamic_k_matching,
)


def test_iou_matcher_thresholds_and_low_quality():
    m = Matcher(thresholds=(0.4, 0.5), labels=(0, -1, 1),
                allow_low_quality_matches=True)
    # anchors: a0 high iou w/ gt0; a1 mid; a2 low; a3 best-for-gt1 (low iou)
    matrix = jnp.asarray(
        [
            [0.8, 0.45, 0.1, 0.05],
            [0.0, 0.10, 0.2, 0.30],
        ]
    )
    valid = jnp.asarray([True, True])
    idx, labels = m(matrix, valid)
    np.testing.assert_array_equal(labels, [1, -1, 0, 1])  # a3 low-quality→1
    assert int(idx[0]) == 0 and int(idx[3]) == 1


def test_iou_matcher_invalid_rows_ignored():
    m = Matcher((0.4, 0.5), (0, -1, 1), True)
    matrix = jnp.asarray([[0.9, 0.9], [0.95, 0.99]])
    valid = jnp.asarray([True, False])  # row 1 is padding
    idx, labels = m(matrix, valid)
    np.testing.assert_array_equal(idx, [0, 0])
    np.testing.assert_array_equal(labels, [1, 1])


def test_dynamic_k_matching_matches_naive():
    rng = np.random.RandomState(0)
    K, M = 5, 40
    cost = rng.rand(K, M).astype(np.float32)
    ious = rng.rand(K, M).astype(np.float32) * 0.5
    gt_valid = np.asarray([True] * 4 + [False])

    matched, fg = topk_dynamic_k_matching(
        jnp.asarray(np.where(gt_valid[:, None], cost, 1e9)),
        jnp.asarray(np.where(gt_valid[:, None], ious, 0.0)),
        jnp.asarray(gt_valid),
        candidate_topk=10,
    )
    matched, fg = np.asarray(matched), np.asarray(fg)

    # naive reference (reference dynamic_k_matching semantics)
    ks = np.maximum(
        np.sort(np.where(gt_valid[:, None], ious, 0.0), axis=1)[:, -10:]
        .sum(1).astype(int), 1)
    matching = np.zeros((K, M), bool)
    for k in range(K):
        if not gt_valid[k]:
            continue
        pos = np.argsort(cost[k])[: ks[k]]
        matching[k, pos] = True
    conflict = matching.sum(0) > 1
    for mcol in np.where(conflict)[0]:
        best = np.argmin(np.where(matching[:, mcol], cost[:, mcol], np.inf))
        matching[:, mcol] = False
        matching[best, mcol] = True
    exp_fg = matching.any(0)
    np.testing.assert_array_equal(fg, exp_fg)
    exp_match = np.argmax(matching, axis=0)
    np.testing.assert_array_equal(matched[exp_fg], exp_match[exp_fg])


def test_auction_matches_scipy_hungarian():
    from scipy.optimize import linear_sum_assignment

    rng = np.random.RandomState(1)
    for trial in range(5):
        Q, K = 20, 7
        cost = rng.rand(Q, K).astype(np.float32) * 10
        owner = np.asarray(hungarian_match_owner(jnp.asarray(cost), n_iters=500))
        rows, cols = linear_sum_assignment(cost)
        # compare total assignment cost (auction is eps-optimal; with
        # distinct random costs it finds the same optimum)
        auction_cost = sum(cost[owner[k], k] for k in range(K))
        optimal_cost = cost[rows, cols].sum()
        assert len(set(owner.tolist())) == K, "owners must be distinct"
        assert auction_cost <= optimal_cost + 0.05 * abs(optimal_cost) + 1e-3


def test_auction_valid_mask_competitive():
    """Round-4 DETR regression: padded (invalid) targets must not distort
    the auction. Competitive cost structure (shared per-query quality, small
    per-target differences) with K == Q and garbage 1e6 padding — exactly
    the production DETR shape that made the old matcher near-arbitrary."""
    from scipy.optimize import linear_sum_assignment

    rng = np.random.RandomState(7)
    hm = jax.jit(hungarian_match_owner)
    for (Q, K, V) in [(100, 100, 15), (100, 100, 60), (16, 8, 5)]:
        base = rng.randn(Q) * 3.0
        cost = (base[:, None] + rng.randn(Q, K) * 0.3).astype(np.float32)
        valid = np.zeros(K, bool)
        valid[:V] = True
        cost[:, V:] = 1e6  # garbage in padded columns must be ignored
        owner = np.asarray(hm(jnp.asarray(cost), jnp.asarray(valid)))
        ov = owner[:V]
        assert (ov >= 0).all(), "every valid target must be assigned"
        assert len(set(ov.tolist())) == V, "owners must be distinct"
        ours = cost[ov, np.arange(V)].sum()
        r, c = linear_sum_assignment(cost[:, :V].T)
        opt = cost[c, r].sum()
        # eps-optimality: subopt <= V * eps = V * 2e-3 * range (~0.25 here)
        assert ours - opt <= 0.5, (ours, opt)
        # invalid targets are flagged, not silently assigned
        assert (owner[V:] == -2).all()


def test_sinkhorn_plan_marginals():
    mu = jnp.asarray([2.0, 1.0, 7.0])
    nu = jnp.ones((10,))
    cost = jnp.asarray(np.random.RandomState(0).rand(3, 10), jnp.float32)
    plan = sinkhorn_log(mu, nu, cost, eps=0.05, n_iters=200)
    np.testing.assert_allclose(np.asarray(plan).sum(axis=1), mu, atol=1e-2)
    np.testing.assert_allclose(np.asarray(plan).sum(axis=0), nu, atol=1e-2)


def test_auction_nested_vmap_matches_single():
    """DETR calls the auction under vmap(layers) x vmap(batch)
    (models/det/detr.py get_losses). Batching must not mix rows across the
    mapped axes — r5 bisect ruled this out as the DETR collapse cause; keep
    it ruled out."""
    rng = np.random.RandomState(7)
    L, B, Q, K = 2, 3, 6, 4
    cost = jnp.asarray(rng.randn(L, B, Q, K).astype(np.float32))
    valid = jnp.asarray(rng.rand(L, B, K) < 0.7)

    f = lambda c, v: hungarian_match_owner(c, valid=v)
    owners_vv = np.asarray(jax.vmap(jax.vmap(f))(cost, valid))
    for l in range(L):
        for b in range(B):
            ref = np.asarray(f(cost[l, b], valid[l, b]))
            np.testing.assert_array_equal(owners_vv[l, b], ref)
