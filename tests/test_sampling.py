"""Sampler correctness: the sort-free bisection thresholds must reproduce
the classic sorted-filter semantics exactly (reference mlx_lm
sample_utils.make_sampler used at sesame.py:719 and the per-model
samplers)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_audio_tpu.models.sampling import (
    apply_repetition_penalty,
    sample_top_k,
    sample_top_p,
)


def _kept_set_top_k(logits: np.ndarray, k: int) -> np.ndarray:
    """Reference: keep z >= k-th largest (ties at the boundary kept)."""
    kth = np.sort(logits)[-k]
    return logits >= kth


def _kept_set_top_p(logits: np.ndarray, p: float) -> np.ndarray:
    """Reference: smallest top set whose softmax mass reaches p, plus ties
    of the boundary value."""
    z = logits - logits.max()
    probs = np.exp(z) / np.exp(z).sum()
    order = np.argsort(-logits, kind="stable")
    cum = np.cumsum(probs[order])
    m = int(np.searchsorted(cum, p, side="left"))  # first idx with cum >= p
    tau = logits[order[min(m, len(order) - 1)]]
    return logits >= tau


def _sampled_support(sampler, logits, n=256, **kw):
    """Set of token ids the sampler actually emits over n keys."""
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    toks = jax.vmap(lambda k: sampler(k, logits[None], **kw)[0])(keys)
    return set(np.asarray(toks).tolist())


@pytest.mark.parametrize("v,k", [(97, 5), (640, 50), (1000, 1),
                                 (20_000, 50)])  # >= _BISECT_MIN_VOCAB
def test_top_k_support_matches_sorted_reference(v, k):
    rng = np.random.default_rng(v)
    logits = rng.standard_normal(v).astype(np.float32) * 3
    kept = _kept_set_top_k(logits, k)
    support = _sampled_support(sample_top_k, jnp.asarray(logits),
                               temp=0.8, top_k=k)
    assert support <= set(np.nonzero(kept)[0].tolist())
    if k == 1:
        assert support == {int(np.argmax(logits))}


def test_top_k_ties_at_boundary_are_kept():
    logits = np.zeros(64, np.float32)
    logits[[3, 17, 40]] = 5.0          # three-way tie above the rest
    support = _sampled_support(sample_top_k, jnp.asarray(logits),
                               temp=1.0, top_k=2)
    # boundary value 5.0 is tied: all three stay eligible
    assert support == {3, 17, 40}


@pytest.mark.parametrize("v,p", [(97, 0.5), (640, 0.9), (4000, 0.95),
                                 (20_000, 0.9)])  # >= _BISECT_MIN_VOCAB
def test_top_p_support_matches_nucleus_reference(v, p):
    rng = np.random.default_rng(v + 1)
    logits = (rng.standard_normal(v) * 4).astype(np.float32)
    kept = _kept_set_top_p(logits, p)
    support = _sampled_support(sample_top_p, jnp.asarray(logits),
                               temp=1.0, top_p=p)
    assert support <= set(np.nonzero(kept)[0].tolist())


def test_top_p_is_not_degenerate_argmax():
    """Regression: the old sorted-filter picked max() of the kept prefix as
    the cutoff, collapsing every top_p < 1 to greedy."""
    logits = np.array([2.0, 1.9, 1.8, -10.0], np.float32)
    support = _sampled_support(sample_top_p, jnp.asarray(logits),
                               temp=1.0, top_p=0.95)
    assert len(support) >= 2           # near-uniform head must all appear
    assert 3 not in support            # the tail token is excluded


def test_greedy_and_disabled_filters():
    logits = jnp.asarray(np.array([0.1, 3.0, -1.0], np.float32))
    k = jax.random.PRNGKey(0)
    assert int(sample_top_k(k, logits[None], temp=0.0, top_k=2)[0]) == 1
    assert int(sample_top_p(k, logits[None], temp=0.0, top_p=0.5)[0]) == 1
    # top_k=0 / top_p=1 leave the distribution unfiltered (any token legal)
    s = _sampled_support(sample_top_k, logits, temp=2.0, top_k=0)
    assert s <= {0, 1, 2} and 1 in s


def test_repetition_penalty_matches_reference():
    logits = np.array([[1.0, -1.0, 2.0, 0.5]], np.float32)
    hist = np.array([[2, -1, 0]], np.int32)   # tokens 2 and 0 seen; -1 pad
    out = np.asarray(apply_repetition_penalty(
        jnp.asarray(logits), jnp.asarray(hist), 2.0))
    np.testing.assert_allclose(out[0], [0.5, -1.0, 1.0, 0.5])
