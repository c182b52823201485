"""On-device token sampling (replaces mlx_lm.sample_utils.make_sampler used
at reference sesame.py:719 and the per-model samplers).

All samplers are jit-safe pure functions of (key, logits)."""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


# Above this vocab size the O(V log^2 V) on-device full sort dominates a
# decode step; below it the small sort is cheapest (measured: sort at
# Spark's V=166k cost ~ms/token, while at CSM's V=2051 the alternatives
# are pure latency in the scan).  Large-vocab top-k now routes through
# lax.top_k + categorical over the k kept values (round-3 probe,
# scripts/opt_causal_probe.py: 889 us/step vs 1139 for the 48-iteration
# value bisection and 2587 for top_k+full-vocab categorical at V=166k);
# large-vocab top-p keeps the bisection (nucleus needs a mass threshold).
_BISECT_MIN_VOCAB = 16384


def _bisect_threshold(z: jax.Array, keep_fn, iters: int = 48) -> jax.Array:
    """Largest tau such that keep_fn(tau) holds, via value bisection.

    keep_fn(tau [..., 1]) -> bool [..., 1], monotone decreasing in tau
    (true at min(z), false above max(z)).  48 iterations shrink the
    bracket below f32 resolution of the logit range, so masking `z >= tau`
    reproduces the exact sorted-threshold semantics (ties at the boundary
    are kept, as with `where(z < kth, -inf, z)`) — without an O(V log^2 V)
    on-device sort per token, which dominated decode at 150k-class vocabs
    (Spark/OuteTTS; a full jnp.sort inside the scan cost ~ms/token)."""
    finite = jnp.isfinite(z)
    lo = jnp.min(jnp.where(finite, z, jnp.inf), axis=-1, keepdims=True)
    hi = jnp.max(jnp.where(finite, z, -jnp.inf), axis=-1, keepdims=True)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        ge = keep_fn(mid)
        return jnp.where(ge, mid, lo), jnp.where(ge, hi, mid)

    lo, _ = jax.lax.fori_loop(0, iters, body, (lo, hi))
    # a fully masked row (all -inf, e.g. a padded batch row) would yield
    # lo=+inf and mask everything; fall back to the unfiltered distribution
    return jnp.where(jnp.any(finite, axis=-1, keepdims=True), lo, -jnp.inf)


def sample_top_k(key: jax.Array, logits: jax.Array, temp: float = 1.0,
                 top_k: int = 0) -> jax.Array:
    """logits [..., V] -> int32 samples [...].  top_k=0 disables the filter;
    temp=0 is greedy."""
    if temp == 0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    # sample in f32: bf16 logits lose top-k tie resolution and categorical
    # precision; the cast is O(V), negligible
    logits = logits.astype(jnp.float32) / temp
    v = logits.shape[-1]
    if top_k > 0 and top_k < v:
        if v < _BISECT_MIN_VOCAB:
            # sorted-filter semantics: ties at the k-th value all kept
            tau = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
            logits = jnp.where(logits < tau, -jnp.inf, logits)
        else:
            # large vocab: categorical over the k kept values only — a
            # full-vocab Gumbel draw at 150k-class vocabs costs more than
            # the whole filter (probe numbers above).  Ties at the k-th
            # value break by index here (measure-zero for real logits).
            vals, idx = jax.lax.top_k(logits, top_k)
            pick = jax.random.categorical(key, vals, axis=-1)
            return jnp.take_along_axis(
                idx, pick[..., None], axis=-1)[..., 0].astype(jnp.int32)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def sample_top_p(key: jax.Array, logits: jax.Array, temp: float = 1.0,
                 top_p: float = 1.0) -> jax.Array:
    """Nucleus sampling: keep the smallest set of top tokens whose
    probability mass reaches top_p (boundary token and its ties kept)."""
    if temp == 0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits.astype(jnp.float32) / temp
    if top_p < 1.0:
        probs = jax.nn.softmax(logits, axis=-1)
        if logits.shape[-1] < _BISECT_MIN_VOCAB:
            # sorted prefix: smallest top set with cum mass >= top_p; tau =
            # that boundary value (ties kept by the >= tau filter below)
            sl = jnp.sort(logits, axis=-1)[..., ::-1]
            sp = jnp.sort(probs, axis=-1)[..., ::-1]
            cum = jnp.cumsum(sp, axis=-1)
            keep = cum - sp < top_p
            tau = jnp.min(jnp.where(keep, sl, jnp.inf), axis=-1,
                          keepdims=True)
        else:  # tau = largest threshold whose kept mass reaches top_p
            tau = _bisect_threshold(
                logits,
                lambda t: jnp.sum(jnp.where(logits >= t, probs, 0.0),
                                  axis=-1, keepdims=True) >= top_p,
            )
        logits = jnp.where(logits < tau, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def _row_keys(key: jax.Array, n: int) -> jax.Array:
    return jax.vmap(jax.random.fold_in, (None, 0))(key, jnp.arange(n))


def sample_top_k_rows(key: jax.Array, logits: jax.Array, temp: float = 1.0,
                      top_k: int = 0) -> jax.Array:
    """Per-row keyed top-k over [B, V] logits: row i draws with
    fold_in(key, i), so a row's sample is a function of (key, row index,
    its own logits) only — independent of batch size and co-batched rows.
    This is what makes dp batch padding bit-exact for real rows (the
    Kokoro per-row-noise contract, applied to AR sampling)."""
    if temp == 0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    keys = _row_keys(key, logits.shape[0])
    return jax.vmap(lambda k, z: sample_top_k(k, z, temp, top_k))(keys, logits)


def sample_top_p_rows(key: jax.Array, logits: jax.Array, temp: float = 1.0,
                      top_p: float = 1.0) -> jax.Array:
    """Per-row keyed nucleus sampling (see sample_top_k_rows)."""
    if temp == 0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    keys = _row_keys(key, logits.shape[0])
    return jax.vmap(lambda k, z: sample_top_p(k, z, temp, top_p))(keys, logits)


def make_sampler(temp: float = 1.0, top_k: int = 0,
                 top_p: float = 1.0) -> Callable:
    """Returns sampler(key, logits) -> tokens (mirrors mlx_lm's factory)."""
    if top_p < 1.0:
        return lambda key, logits: sample_top_p(key, logits, temp, top_p)
    return lambda key, logits: sample_top_k(key, logits, temp, top_k)


def apply_repetition_penalty(logits: jax.Array, history: jax.Array,
                             penalty: float) -> jax.Array:
    """history: int tokens [..., H] (pad with -1).  Penalized logits."""
    if penalty == 1.0:
        return logits
    v = logits.shape[-1]
    hist = jnp.where(history < 0, v, history)  # map pad outside vocab
    onehot = jax.nn.one_hot(hist, v + 1, dtype=jnp.bool_).any(axis=-2)[..., :v]
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(onehot, penalized, logits)
