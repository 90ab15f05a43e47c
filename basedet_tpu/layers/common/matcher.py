"""Label-assignment matchers as static-shape pure functions.

Capability analogue of /root/reference/basedet/layers/common/matcher.py
(Matcher:19-51, SinkhornMatcher:106-126, OTATopkMatcher:129-161,
HungarianMatcher:54-103). TPU-native redesign: every matcher consumes a
PADDED gt set (K rows, ``gt_valid`` mask) and returns dense per-candidate
results — no data-dependent shapes.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

_NEG = -1e8


@dataclass(frozen=True)
class Matcher:
    """IoU-threshold matcher with optional low-quality matches.

    thresholds: ascending bin edges, e.g. (0.4, 0.5).
    labels: one per bin, e.g. (0, -1, 1) → below 0.4 = background,
        [0.4, 0.5) = ignore, >= 0.5 = foreground.
    """

    thresholds: Sequence[float]
    labels: Sequence[int]
    allow_low_quality_matches: bool = False

    def __call__(
        self, matrix: jnp.ndarray, row_valid: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """matrix: (K, M) match quality (IoU) of K padded gts vs M anchors;
        row_valid: (K,) bool. Returns (match_indices (M,), labels (M,))."""
        assert len(self.thresholds) + 1 == len(self.labels)
        masked = jnp.where(row_valid[:, None], matrix, _NEG)
        max_scores = jnp.max(masked, axis=0)
        match_indices = jnp.argmax(masked, axis=0)

        labels = jnp.full(matrix.shape[1], -1, jnp.int32)
        edges = [-jnp.inf] + list(self.thresholds) + [jnp.inf]
        for label, low, high in zip(self.labels, edges[:-1], edges[1:]):
            in_bin = (max_scores >= low) & (max_scores < high)
            labels = jnp.where(in_bin, jnp.int32(label), labels)

        if self.allow_low_quality_matches:
            row_max = jnp.max(masked, axis=1, keepdims=True)
            is_best = (masked == row_max) & row_valid[:, None]
            labels = jnp.where(jnp.any(is_best, axis=0), 1, labels)
        return match_indices, labels


def sinkhorn_log(
    mu: jnp.ndarray,
    nu: jnp.ndarray,
    cost: jnp.ndarray,
    eps: float = 0.1,
    n_iters: int = 50,
) -> jnp.ndarray:
    """Log-domain Sinkhorn optimal-transport plan.

    Analogue of /root/reference/basedet/layers/blocks/sinkhorn_distance.py:7-50,
    fixed-iteration (TPU-friendly — no convergence-dependent control flow).
    mu: (K+1,) supply, nu: (M,) demand, cost: (K+1, M). Returns plan (K+1, M).
    """
    log_mu = jnp.log(jnp.maximum(mu, 1e-12))
    log_nu = jnp.log(jnp.maximum(nu, 1e-12))
    M = -cost / eps

    def body(_, uv):
        u, v = uv
        u = log_mu - jax.nn.logsumexp(M + v[None, :], axis=1)
        v = log_nu - jax.nn.logsumexp(M + u[:, None], axis=0)
        return u, v

    u = jnp.zeros_like(log_mu)
    v = jnp.zeros_like(log_nu)
    u, v = jax.lax.fori_loop(0, n_iters, body, (u, v))
    return jnp.exp(M + u[:, None] + v[None, :])


@dataclass(frozen=True)
class SinkhornMatcher:
    """OTA's Sinkhorn matcher (matcher.py:106-126): per-gt supply from the
    top-20 IoU sum (dynamic-k); plan rows rescaled so each gt's max mass is
    1 before the per-anchor argmax (matching the reference's rescale)."""

    eps: float = 0.1
    n_iters: int = 50
    topk: int = 20

    def __call__(
        self,
        cost: jnp.ndarray,          # (K, M) fg cost
        bg_cost: jnp.ndarray,       # (M,) background cost row
        gt_valid: jnp.ndarray,      # (K,)
        ious: jnp.ndarray,          # (K, M) — drives dynamic-k supply
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (matched_gt (M,) int, fg_mask (M,))."""
        from basedet_tpu.layers.common.function import extract_topk_mask

        K, M = cost.shape
        k_cap = min(self.topk, M)
        topk_ious, _ = extract_topk_mask(ious, k_cap)  # no row sort on TPU
        dynamic_ks = jnp.clip(jnp.sum(topk_ious, axis=1), 1.0, None)
        ks = jnp.where(gt_valid, jnp.floor(dynamic_ks), 0.0)
        mu = jnp.concatenate([ks, jnp.asarray([M - jnp.sum(ks)])])
        nu = jnp.ones((M,), jnp.float32)
        full_cost = jnp.concatenate(
            [jnp.where(gt_valid[:, None], cost, 1e6), bg_cost[None, :]], axis=0
        )
        plan = sinkhorn_log(mu, nu, full_cost, self.eps, self.n_iters)
        plan = plan / jnp.maximum(jnp.max(plan, axis=1, keepdims=True), 1e-12)
        assigned = jnp.argmax(plan, axis=0)  # (M,) in [0, K]
        matched = jnp.clip(assigned, 0, K - 1)
        # gt_valid[matched] without M scalar gathers (one pass over (K, M))
        from basedet_tpu.layers.common.function import onehot_pick_per_column

        matched_valid = onehot_pick_per_column(
            jnp.broadcast_to(gt_valid[:, None].astype(jnp.float32), (K, M)),
            matched,
        ) > 0.5
        fg_mask = (assigned < K) & matched_valid
        return matched, fg_mask


def topk_dynamic_k_matching(
    cost: jnp.ndarray,
    ious: jnp.ndarray,
    gt_valid: jnp.ndarray,
    candidate_topk: int = 10,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SimOTA/OTA dynamic-k matching as masked matrix ops.

    Analogue of OTATopkMatcher (matcher.py:129-161) and YOLOX
    dynamic_k_matching (models/det/yolox.py:375-408), without the per-GT
    python loop: dynamic-k selection becomes a rank-vs-k comparison and
    conflicts resolve by argmin cost.

    cost: (K, M) assignment cost (invalid anchors should carry +large cost).
    ious: (K, M) pairwise IoU used to derive per-gt k.
    Returns (matched_gt (M,) int32, fg_mask (M,) bool).

    TPU note: XLA TopK over the 8400-wide rows plus the index scatter that
    rebuilds the (K, M) matching mask measured ~130 ms of a 360 ms YOLOX-S
    b128 step. Since k ≤ 10, iterative max-extraction is far cheaper: k
    masked argmax/argmin passes over (K, M) — pure reductions + elementwise
    selects, no sort, no scatter (~10 x faster, selection identical with the
    same lowest-index tie-break as lax.top_k).
    """
    K, M = cost.shape
    k_cap = min(candidate_topk, M)

    if jax.default_backend() == "tpu":
        # VMEM-resident Pallas kernel: one HBM read of cost+ious instead of
        # 2·k full passes (ops/matching_pallas.py; selection identical).
        # Works under vmap — pallas_call's batching rule adds the batch as a
        # leading grid dimension.
        from basedet_tpu.ops.matching_pallas import dynamic_k_matching_pallas

        best, fg = dynamic_k_matching_pallas(
            cost[None], ious[None], gt_valid[None], k_cap
        )
        return best[0], fg[0]

    col = jax.lax.broadcasted_iota(jnp.int32, (K, M), 1)

    # sum of per-gt top-k ious → dynamic_k  (k argmax-extraction passes)
    def iou_body(carry, _):
        iou_m, s = carry
        am = jnp.argmax(iou_m, axis=1)                      # (K,)
        pick = col == am[:, None]                           # (K, M) one-hot
        s = s + jnp.max(iou_m, axis=1)
        return (jnp.where(pick, -jnp.inf, iou_m), s), None

    (_, iou_sum), _ = jax.lax.scan(
        iou_body, (ious, jnp.zeros((K,), ious.dtype)), None, length=k_cap
    )
    dynamic_ks = jnp.clip(iou_sum.astype(jnp.int32), 1, k_cap)
    dynamic_ks = jnp.where(gt_valid, dynamic_ks, 0)

    # per-gt dynamic_k lowest-cost anchors (k argmin-extraction passes);
    # the one-hot pick replaces the index scatter
    def cost_body(carry, i):
        cost_m, matching = carry
        am = jnp.argmin(cost_m, axis=1)                     # (K,)
        pick = col == am[:, None]
        take = pick & (i < dynamic_ks)[:, None]
        return (jnp.where(pick, jnp.inf, cost_m), matching | take), None

    (_, matching), _ = jax.lax.scan(
        cost_body,
        (cost, jnp.zeros((K, M), bool)),
        jnp.arange(k_cap),
    )

    # resolve anchors matched to multiple gts: keep argmin-cost gt
    num_matches = jnp.sum(matching, axis=0)         # (M,)
    cost_masked = jnp.where(matching, cost, jnp.inf)
    best_gt = jnp.argmin(cost_masked, axis=0)       # (M,)
    fg_mask = num_matches > 0
    return best_gt.astype(jnp.int32), fg_mask


def hungarian_match_owner(
    cost: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    n_iters: int = 1500,
    eps_scale: float = 2e-3,
) -> jnp.ndarray:
    """On-device ASYMMETRIC auction assignment (DETR's Hungarian matching).

    Analogue of HungarianMatcher's scipy ``linear_sum_assignment`` host call
    (matcher.py:54-103), re-designed for TPU as a fixed-capacity auction.
    Since targets (K) ≤ queries (Q), the TARGETS are the bidders: each
    unassigned target bids for its best query (net of prices); highest
    bidder wins, evicting the previous owner. eps-complementary slackness
    bounds suboptimality by V·eps (V = number of valid targets).

    Round-4 root cause of DETR non-convergence (logs/sanity_e2e_detr_long_r4
    plateau at ~4.3): (a) callers padded invalid target columns with cost
    1e6 and eps was scaled off max(cost)−min(cost), inflating eps ~1e5× —
    bids dwarfed real cost differences and the matching was near-arbitrary;
    (b) with K == Q (100 padded targets vs 100 queries) the ~94 uniform-
    value padded bidders forced a perfect matching the 300-round cap could
    not reach, so real targets came back owner = −1 and were silently
    DROPPED from the loss. Fix: invalid targets never bid (they need no
    owner — losses mask them), eps scales off the VALID cost range only
    (measured: eps = 2e-3·range converges in ≤150 rounds at V = 60 with
    gap ≤ 0.07 vs scipy; the while_loop exits at convergence so the cap is
    rarely reached), and a greedy completion pass guarantees every valid
    target ends with a distinct query even if the cap is hit.

    cost: (Q, K); valid: (K,) bool (None = all valid).
    Returns (K,) int32: query owned by each valid target; -2 for invalid.
    """
    Q, K = cost.shape
    if valid is None:
        valid = jnp.ones((K,), bool)
    valid = valid.astype(bool)
    vmax = jnp.max(jnp.where(valid[None, :], cost, -jnp.inf))
    vmax = jnp.where(jnp.isfinite(vmax), vmax, 0.0)
    vmin = jnp.min(jnp.where(valid[None, :], cost, jnp.inf))
    vmin = jnp.where(jnp.isfinite(vmin), vmin, 0.0)
    cost_range = jnp.maximum(vmax - vmin, 1e-6)
    eps = eps_scale * cost_range
    value_qk = jnp.where(valid[None, :], -cost, 0.0).T  # (K, Q) benefits

    q_idx = jnp.arange(Q, dtype=jnp.int32)
    q_of_k = jnp.where(valid, -1, -2).astype(jnp.int32)
    k_of_q = jnp.full((Q,), -1, jnp.int32)
    prices = jnp.zeros((Q,))

    def cond(state):
        i, _, q_of_k, _ = state
        return (i < n_iters) & jnp.any(q_of_k == -1)

    def body(state):
        i, prices, q_of_k, k_of_q = state
        unassigned = q_of_k == -1  # (K,) only valid targets ever bid
        net = value_qk - prices[None, :]  # (K, Q)
        top2, top2_idx = jax.lax.top_k(net, 2)
        best_q = top2_idx[:, 0]
        bid = jnp.where(unassigned, top2[:, 0] - top2[:, 1] + eps, 0.0)
        bids = jnp.zeros((K, Q)).at[jnp.arange(K), best_q].set(bid)
        win_bid = jnp.max(bids, axis=0)   # (Q,)
        winner = jnp.argmax(bids, axis=0)
        won = win_bid > 0

        # evict previous owners of won queries
        prev = jnp.where(won, k_of_q, -1)  # (Q,) target to evict or -1
        q_of_k = q_of_k.at[jnp.where(prev >= 0, prev, K)].set(
            -1, mode="drop"
        )
        # assign winners
        q_of_k = q_of_k.at[jnp.where(won, winner, K)].set(
            q_idx, mode="drop"
        )
        k_of_q = jnp.where(won, winner, k_of_q)
        # clear stale k_of_q entries whose target moved elsewhere
        stale = (k_of_q >= 0) & (
            q_of_k[jnp.clip(k_of_q, 0, K - 1)] != q_idx
        )
        k_of_q = jnp.where(stale, -1, k_of_q)
        prices = jnp.where(won, prices + win_bid, prices)
        return i + 1, prices, q_of_k, k_of_q

    _, prices, q_of_k, k_of_q = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), prices, q_of_k, k_of_q)
    )

    # greedy completion: if the iteration cap left valid targets unassigned
    # (pathological price wars), give each its best still-free query — a
    # perfect matching over valid targets is guaranteed (V ≤ Q required).
    owned = jnp.zeros((Q,), bool).at[
        jnp.where(q_of_k >= 0, q_of_k, Q)
    ].set(True, mode="drop")

    def fill(k, state):
        q_of_k, owned = state
        need = q_of_k[k] == -1
        net = jnp.where(owned, -jnp.inf, value_qk[k])
        q = jnp.argmax(net).astype(jnp.int32)
        q_of_k = q_of_k.at[k].set(jnp.where(need, q, q_of_k[k]))
        owned = owned.at[q].set(owned[q] | need)
        return q_of_k, owned

    q_of_k, _ = jax.lax.fori_loop(0, K, fill, (q_of_k, owned))
    return q_of_k
