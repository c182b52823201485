"""On-device token sampling (replaces mlx_lm.sample_utils.make_sampler used
at reference sesame.py:719 and the per-model samplers).

All samplers are jit-safe pure functions of (key, logits)."""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def sample_top_k(key: jax.Array, logits: jax.Array, temp: float = 1.0,
                 top_k: int = 0) -> jax.Array:
    """logits [..., V] -> int32 samples [...].  top_k=0 disables the filter;
    temp=0 is greedy."""
    if temp == 0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    # sample in f32: bf16 logits lose top-k tie resolution and categorical
    # precision; the cast is O(V), negligible
    logits = logits.astype(jnp.float32) / temp
    if top_k > 0 and top_k < logits.shape[-1]:
        kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def sample_top_p(key: jax.Array, logits: jax.Array, temp: float = 1.0,
                 top_p: float = 1.0) -> jax.Array:
    """Nucleus sampling."""
    if temp == 0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits.astype(jnp.float32) / temp
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens whose cumulative prob (exclusive) < top_p
        cutoff_mask = cum - probs < top_p
        kth = jnp.max(jnp.where(cutoff_mask, sorted_logits, -jnp.inf), axis=-1,
                      keepdims=True)
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


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
