"""sample_mask top_k-threshold path vs the reference double-argsort path.

Reference semantics: basedet sample_labels
(/root/reference/basedet/layers/common/sampling.py:7-30) keeps a uniformly
random subset of at most `num_samples` matching entries.
"""
import jax
import jax.numpy as jnp
import numpy as np

from basedet_tpu.layers.common.sampling import sample_labels, sample_mask


def test_capped_matches_argsort_path():
    rng = jax.random.PRNGKey(0)
    for seed in range(5):
        k = jax.random.fold_in(rng, seed)
        cand = jax.random.uniform(jax.random.fold_in(k, 1), (977,)) < 0.3
        for quota in (0, 1, 17, 128, 500):
            a = sample_mask(k, cand, quota)
            b = sample_mask(k, cand, quota, cap=512)
            # same noise stream -> identical selection (modulo f32 ties,
            # which don't occur at this scale with these seeds)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_at_most_quota_and_subset():
    rng = jax.random.PRNGKey(3)
    cand = jax.random.uniform(jax.random.fold_in(rng, 9), (4096,)) < 0.5
    for quota in (0, 7, 256):
        keep = sample_mask(rng, cand, quota, cap=256)
        keep = np.asarray(keep)
        assert keep.sum() <= quota
        assert not np.any(keep & ~np.asarray(cand))
        # quota larger than candidate count keeps all candidates
    few = jnp.zeros((4096,), bool).at[:5].set(True)
    keep = sample_mask(rng, few, 256, cap=256)
    assert np.asarray(keep).sum() == 5


def test_traced_quota():
    """quota may be a traced scalar (RPN fills negatives to a budget)."""
    rng = jax.random.PRNGKey(1)
    cand = jnp.ones((300,), bool)

    @jax.jit
    def f(q):
        return sample_mask(rng, cand, q, cap=256)

    assert int(np.asarray(f(jnp.int32(40)).sum())) == 40
    assert int(np.asarray(f(jnp.int32(0)).sum())) == 0


def test_sample_labels_demotes_surplus():
    rng = jax.random.PRNGKey(2)
    labels = jnp.asarray(np.r_[np.ones(50), np.zeros(50)].astype(np.int32))
    out = np.asarray(sample_labels(rng, labels, 10, 1, ignore_label=-1))
    assert (out == 1).sum() == 10
    assert (out == -1).sum() == 40
    assert (out == 0).sum() == 50
