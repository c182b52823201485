"""Attention blocks: SDPA, GQA/MHA, rotary embeddings, functional KV caches.

TPU-first notes:

* The KV cache is a fixed-capacity pytree (static shapes) updated with
  ``lax.dynamic_update_slice`` and carried functionally through decode scans
  — the XLA-native replacement for the reference's mutable cache objects
  (codec/models/mimi/modules/kv_cache.py:14-110).
* Masks are additive float; causal masks are built once per static length.
* RoPE cos/sin tables are precomputed constants (sesame attention.py:10-111
  builds them per layer; here they are shared).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.nn.module import Module
from mlx_audio_tpu.nn.layers import Linear


def scaled_dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """q: [B, Hq, Lq, D], k/v: [B, Hkv, Lk, D] (GQA broadcast), additive mask.

    Softmax in f32 regardless of activation dtype.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    hq, hkv = q.shape[1], k.shape[1]
    if hq != hkv:
        # grouped-query attention without materializing repeated K/V (a
        # jnp.repeat here would copy the full cache every decode step)
        b, _, lq, d = q.shape
        rep = hq // hkv
        qg = q.reshape(b, hkv, rep, lq, d)
        scores = jnp.einsum("bgrqd,bgkd->bgrqk", qg, k).astype(jnp.float32)
        scores = scores * scale
        if mask is not None:
            if mask.ndim == 4 and mask.shape[1] == hq:
                m = mask.reshape(b, hkv, rep, *mask.shape[2:])
            elif mask.ndim == 4:
                m = mask[:, :, None]
            else:
                m = mask
            scores = scores + m
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        out = jnp.einsum("bgrqk,bgkd->bgrqd", probs, v)
        return out.reshape(b, hq, lq, d)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def causal_mask(length: int, dtype=jnp.float32) -> jax.Array:
    """[length, length] additive causal mask."""
    i = np.arange(length)[:, None]
    j = np.arange(length)[None, :]
    m = np.where(j > i, -1e9, 0.0).astype(np.float32)
    return jnp.asarray(m, dtype=dtype)


# ---------------------------------------------------------------------------
# Rotary embeddings
# ---------------------------------------------------------------------------


def rope_table(
    head_dim: int,
    max_len: int,
    base: float = 10000.0,
    scaling: Optional[dict] = None,
) -> tuple[jax.Array, jax.Array]:
    """Precompute (cos, sin) tables [max_len, head_dim//2].

    ``scaling`` implements Llama-3 frequency scaling (cf. reference
    sesame/attention.py:33-72): keys ``factor``, ``low_freq_factor``,
    ``high_freq_factor``, ``original_max_position_embeddings``.
    """
    inv_freq = 1.0 / (base ** (np.arange(0, head_dim, 2) / head_dim))
    if scaling:
        factor = scaling.get("factor", 8.0)
        low = scaling.get("low_freq_factor", 1.0)
        high = scaling.get("high_freq_factor", 4.0)
        orig = scaling.get("original_max_position_embeddings", 8192)
        wavelen = 2 * np.pi / inv_freq
        low_wl = orig / low
        high_wl = orig / high
        smooth = (orig / wavelen - low) / (high - low)
        scaled = np.where(
            wavelen > low_wl,
            inv_freq / factor,
            np.where(
                wavelen < high_wl,
                inv_freq,
                (1 - smooth) * inv_freq / factor + smooth * inv_freq,
            ),
        )
        inv_freq = scaled
    t = np.arange(max_len)
    freqs = np.outer(t, inv_freq)
    return jnp.asarray(np.cos(freqs), jnp.float32), jnp.asarray(np.sin(freqs), jnp.float32)


def apply_rope(
    x: jax.Array, cos: jax.Array, sin: jax.Array, positions: Optional[jax.Array] = None
) -> jax.Array:
    """Rotate [B, H, L, D] queries/keys.  Pairs are (x[..., :D/2], x[..., D/2:])
    (torch/HF "half-split" convention used by Llama checkpoints)."""
    if positions is not None:
        c = jnp.take(cos, positions, axis=0)  # [B?, L, D/2] or [L, D/2]
        s = jnp.take(sin, positions, axis=0)
    else:
        c = cos[: x.shape[-2]]
        s = sin[: x.shape[-2]]
    if positions is not None and positions.ndim == 2:
        # batched positions: insert the head axis ([B, L, D/2] -> [B, 1, L,
        # D/2]); prepending would misalign batch against heads
        c = c[:, None]
        s = s[:, None]
    while c.ndim < x.ndim:
        c = c[None]
        s = s[None]
    x1, x2 = jnp.split(x, 2, axis=-1)
    c = c.astype(x.dtype)
    s = s.astype(x.dtype)
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


# ---------------------------------------------------------------------------
# KV cache (functional, static capacity)
# ---------------------------------------------------------------------------


class KVCache(NamedTuple):
    """Fixed-capacity decode cache. k/v: [B, Hkv, max_len, D]; idx: scalar."""

    k: jax.Array
    v: jax.Array
    idx: jax.Array  # int32 scalar — next write position

    @classmethod
    def create(cls, batch: int, num_kv_heads: int, max_len: int, head_dim: int,
               dtype=jnp.float32) -> "KVCache":
        return cls(
            k=jnp.zeros((batch, num_kv_heads, max_len, head_dim), dtype=dtype),
            v=jnp.zeros((batch, num_kv_heads, max_len, head_dim), dtype=dtype),
            idx=jnp.zeros((), dtype=jnp.int32),
        )

    def update(self, k_new: jax.Array, v_new: jax.Array) -> "KVCache":
        """Write [B, Hkv, S, D] at the current index; returns new cache."""
        start = (0, 0, self.idx, 0)
        return KVCache(
            k=jax.lax.dynamic_update_slice(self.k, k_new.astype(self.k.dtype), start),
            v=jax.lax.dynamic_update_slice(self.v, v_new.astype(self.v.dtype), start),
            idx=self.idx + k_new.shape[-2],
        )

    def valid_mask(self, q_len: int, causal: bool = True) -> jax.Array:
        """Additive mask [q_len, max_len] hiding unwritten slots (and the
        future, if causal) for queries ending at the cache's write frontier.

        Called on the PRE-update cache for a step appending ``q_len`` new
        entries: the non-causal limit is idx + q_len (all written slots
        including this step's), never the full capacity."""
        max_len = self.k.shape[-2]
        j = jnp.arange(max_len)[None, :]
        i = jnp.arange(q_len)[:, None]
        limit = self.idx + i + 1 if causal else self.idx + q_len + 0 * i
        return jnp.where(j < limit, 0.0, -1e9).astype(jnp.float32)


def cached_attention(
    q: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    cache: KVCache,
    scale: Optional[float] = None,
    extra_mask: Optional[jax.Array] = None,
) -> tuple[jax.Array, KVCache]:
    """One decode step: append keys/values, attend over the full cache.

    ``extra_mask`` (additive, broadcastable to [B, H, q_len, max_len] — e.g.
    padding) combines with the cache-validity mask."""
    new_cache = cache.update(k_new, v_new)
    mask = cache.valid_mask(q.shape[-2])
    if extra_mask is not None:
        mask = mask + extra_mask
    out = scaled_dot_product_attention(q, new_cache.k, new_cache.v, mask, scale)
    return out, new_cache


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------


class MultiHeadAttention(Module):
    """Generic (optionally GQA) attention with separate q/k/v/o projections."""

    def __init__(
        self,
        dim: int,
        num_heads: int,
        num_kv_heads: Optional[int] = None,
        head_dim: Optional[int] = None,
        bias: bool = False,
        out_dim: Optional[int] = None,
    ):
        self.num_heads = num_heads
        self.num_kv_heads = num_kv_heads or num_heads
        self.head_dim = head_dim or dim // num_heads
        inner = self.num_heads * self.head_dim
        inner_kv = self.num_kv_heads * self.head_dim
        self.q_proj = Linear(dim, inner, bias=bias)
        self.k_proj = Linear(dim, inner_kv, bias=bias)
        self.v_proj = Linear(dim, inner_kv, bias=bias)
        self.o_proj = Linear(inner, out_dim or dim, bias=bias)

    def _split(self, x: jax.Array, heads: int) -> jax.Array:
        b, l, _ = x.shape
        return x.reshape(b, l, heads, self.head_dim).transpose(0, 2, 1, 3)

    def _merge(self, x: jax.Array) -> jax.Array:
        b, h, l, d = x.shape
        return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)

    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        rope: Optional[tuple[jax.Array, jax.Array]] = None,
        positions: Optional[jax.Array] = None,
        cache: Optional[KVCache] = None,
        xk: Optional[jax.Array] = None,
    ):
        """Self- (or cross-, via ``xk``) attention over NLC input.

        Returns output, or (output, new_cache) when a cache is passed.
        """
        q = self._split(self.q_proj(x), self.num_heads)
        src = x if xk is None else xk
        k = self._split(self.k_proj(src), self.num_kv_heads)
        v = self._split(self.v_proj(src), self.num_kv_heads)
        if rope is not None:
            cos, sin = rope
            q = apply_rope(q, cos, sin, positions)
            k = apply_rope(k, cos, sin, positions)
        if cache is not None:
            # the caller's mask (e.g. padding over cache slots) combines
            # with the cache-validity mask rather than being dropped
            out, cache = cached_attention(q, k, v, cache, extra_mask=mask)
            return self.o_proj(self._merge(out)), cache
        out = scaled_dot_product_attention(q, k, v, mask)
        return self.o_proj(self._merge(out))
