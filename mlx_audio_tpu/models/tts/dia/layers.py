"""Dia encoder-decoder transformer layers.

Capability parity with /root/reference/mlx_audio/tts/models/dia/layers.py:
28-870: DenseGeneral projections, fused gate MLP, timescale RoPE, GQA self-
attention with UNSCALED dot products (scale_factor=1.0, layers.py:385-388 —
a deliberate Dia quirk), MHA cross-attention with precomputed encoder KV.
Functional KV caches; decode steps are jit/scan-friendly.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.models.tts.dia.config import DiaConfig
from mlx_audio_tpu.nn import Embedding, KVCache, Module, RMSNorm
from mlx_audio_tpu.nn.layers import _uniform


class DenseGeneral(Module):
    """tensordot projection with multi-axis in/out (layers.py:28-60).
    Weight shape = in_shapes + out_features."""

    def __init__(self, in_shapes: tuple, out_features: tuple):
        self.in_shapes = tuple(in_shapes)
        self.out_features = tuple(out_features)
        scale = 1.0 / np.sqrt(np.prod(in_shapes))
        self.weight = _uniform(self.in_shapes + self.out_features, scale)

    def __call__(self, x: jax.Array) -> jax.Array:
        n_in = len(self.in_shapes)
        axes = tuple(range(x.ndim - n_in, x.ndim))
        return jax.lax.dot_general(
            x, self.weight,
            dimension_numbers=((axes, tuple(range(n_in))), ((), ())),
        )


class MlpBlock(Module):
    """Fused gate/up MLP (layers.py:76-143): wi_fused -> [gate, up]."""

    def __init__(self, embed_dim: int, intermediate_dim: int):
        self.wi_fused = DenseGeneral((embed_dim,), (2, intermediate_dim))
        self.wo = DenseGeneral((intermediate_dim,), (embed_dim,))

    def __call__(self, x):
        fused = self.wi_fused(x)
        gate = jax.nn.silu(fused[..., 0, :])
        up = fused[..., 1, :]
        return self.wo(gate * up)


def rope_timescale(x: jax.Array, positions: jax.Array,
                   min_timescale: float = 1.0,
                   max_timescale: float = 10000.0) -> jax.Array:
    """Dia's RoPE (layers.py:147-185): x [B, T, N, H], positions [B, T]."""
    h = x.shape[-1]
    fraction = (2.0 * np.arange(h // 2)) / h
    timescale = min_timescale * (max_timescale / min_timescale) ** fraction
    sinusoid = positions[..., None, None] / jnp.asarray(timescale, jnp.float32)
    sin = jnp.sin(sinusoid).astype(x.dtype)
    cos = jnp.cos(sinusoid).astype(x.dtype)
    first, second = jnp.split(x, 2, axis=-1)
    return jnp.concatenate(
        [first * cos - second * sin, second * cos + first * sin], axis=-1
    )


class DiaAttention(Module):
    """GQA/MHA attention with unscaled scores (Dia quirk)."""

    def __init__(self, cfg: DiaConfig, q_embed_dim: int, kv_embed_dim: int,
                 num_query_heads: int, num_kv_heads: int, head_dim: int,
                 is_cross_attn: bool = False,
                 out_embed_dim: Optional[int] = None):
        self.num_query_heads = num_query_heads
        self.num_kv_heads = num_kv_heads
        self.head_dim = head_dim
        self.is_cross_attn = is_cross_attn
        # nari-labs applies RoPE to cross-attn q/k (layers.py:317,679); the
        # HF-transformers port (hub checkpoint format) does not.
        self.use_rope = (not is_cross_attn) or cfg.model.cross_attn_rope
        self.num_gqa_groups = num_query_heads // num_kv_heads
        self.rope_min = cfg.model.rope_min_timescale
        self.rope_max = cfg.model.rope_max_timescale
        out_dim = out_embed_dim or q_embed_dim
        self.q_proj = DenseGeneral((q_embed_dim,), (num_query_heads, head_dim))
        self.k_proj = DenseGeneral((kv_embed_dim,), (num_kv_heads, head_dim))
        self.v_proj = DenseGeneral((kv_embed_dim,), (num_kv_heads, head_dim))
        self.o_proj = DenseGeneral((num_query_heads, head_dim), (out_dim,))

    def _rope(self, x, pos):
        if not self.use_rope:
            return x
        return rope_timescale(x, pos, self.rope_min, self.rope_max)

    def _kv(self, xkv, kv_positions):
        k = self._rope(self.k_proj(xkv), kv_positions)  # [B, S, K, H]
        v = self.v_proj(xkv)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        if self.num_gqa_groups > 1:
            k = jnp.repeat(k, self.num_gqa_groups, axis=1)
            v = jnp.repeat(v, self.num_gqa_groups, axis=1)
        return k, v

    def _attend(self, q, k, v, mask):
        scores = jnp.einsum("bnth,bnsh->bnts", q, k).astype(jnp.float32)
        if mask is not None:
            scores = jnp.where(mask, scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        out = jnp.einsum("bnts,bnsh->bnth", probs, v)
        return self.o_proj(out.transpose(0, 2, 1, 3))

    def full(self, xq, xkv, q_positions, kv_positions, mask=None):
        q = self._rope(self.q_proj(xq), q_positions).transpose(0, 2, 1, 3)
        k, v = self._kv(xkv, kv_positions)
        return self._attend(q, k, v, mask)

    def precompute_cross_kv(self, encoder_out, src_positions):
        return self._kv(encoder_out, src_positions)

    def cross_step(self, xq, q_positions, cross_kv, mask=None):
        q = self._rope(self.q_proj(xq), q_positions).transpose(0, 2, 1, 3)
        k, v = cross_kv
        return self._attend(q, k, v, mask)

    def self_cached(self, xq, q_positions, cache: KVCache, mask):
        """Append this step's KV and attend over the cache buffer.

        The attention is always restricted to written slots (causally up to
        the cache's write frontier): unwritten zero keys would otherwise
        receive softmax weight e^0 and pollute every decode step when the
        caller passes mask=None (as the generate loop does)."""
        q = self._rope(self.q_proj(xq), q_positions).transpose(0, 2, 1, 3)
        k = self._rope(self.k_proj(xq), q_positions).transpose(0, 2, 1, 3)
        v = self.v_proj(xq).transpose(0, 2, 1, 3)
        q_len = xq.shape[1]
        max_len = cache.k.shape[-2]
        j = jnp.arange(max_len)[None, None, None, :]
        i = jnp.arange(q_len)[None, None, :, None]
        valid = j < (cache.idx + i + 1)  # pre-update frontier, causal
        mask = valid if mask is None else (mask & valid)
        # cache stores the UNEXPANDED num_kv_heads (the reference
        # pre-repeats to all query heads — 4x the cache bytes and 4x the
        # per-step reads for the 16q/4kv decoder); queries group at read
        cache = cache.update(k, v)
        out = self._attend_gqa(q, cache.k, cache.v, mask)
        return out, cache

    def _attend_gqa(self, q, k, v, mask):
        """Grouped-query attention without materializing K/V repeats:
        q [B, N, T, H] vs k/v [B, Kv, S, H]; bit-identical to repeating
        (each query head multiplies the same K/V rows either way)."""
        b, n, t, h = q.shape
        kv = k.shape[1]
        g = n // kv
        if g == 1:
            return self._attend(q, k, v, mask)
        qg = q.reshape(b, kv, g, t, h)
        scores = jnp.einsum("bkgth,bksh->bkgts", qg, k).astype(jnp.float32)
        if mask is not None:
            m = mask if mask.ndim == 5 else mask[:, :, None]
            scores = jnp.where(m, scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        out = jnp.einsum("bkgts,bksh->bkgth", probs, v).reshape(b, n, t, h)
        return self.o_proj(out.transpose(0, 2, 1, 3))


class EncoderLayer(Module):
    def __init__(self, cfg: DiaConfig):
        enc = cfg.model.encoder
        eps = cfg.model.normalization_layer_epsilon
        self.pre_sa_norm = RMSNorm(enc.n_embd, eps)
        self.self_attention = DiaAttention(
            cfg, enc.n_embd, enc.n_embd, enc.n_head, enc.n_head, enc.head_dim,
            out_embed_dim=enc.n_embd,
        )
        self.post_sa_norm = RMSNorm(enc.n_embd, eps)
        self.mlp = MlpBlock(enc.n_embd, enc.n_hidden)

    def __call__(self, x, src_positions, mask):
        x = x + self.self_attention.full(
            self.pre_sa_norm(x), self.pre_sa_norm(x), src_positions,
            src_positions, mask,
        )
        x = x + self.mlp(self.post_sa_norm(x))
        return x


class DiaEncoder(Module):
    def __init__(self, cfg: DiaConfig):
        enc = cfg.model.encoder
        self.embedding = Embedding(cfg.model.src_vocab_size, enc.n_embd)
        self.layers = [EncoderLayer(cfg) for _ in range(enc.n_layer)]
        self.norm = RMSNorm(enc.n_embd, cfg.model.normalization_layer_epsilon)

    def __call__(self, x_ids, src_positions, mask):
        x = self.embedding(x_ids)
        for layer in self.layers:
            x = layer(x, src_positions, mask)
        return self.norm(x)


class DecoderLayer(Module):
    def __init__(self, cfg: DiaConfig):
        dec = cfg.model.decoder
        enc = cfg.model.encoder
        eps = cfg.model.normalization_layer_epsilon
        self.pre_sa_norm = RMSNorm(dec.n_embd, eps)
        self.pre_ca_norm = RMSNorm(dec.n_embd, eps)
        self.pre_mlp_norm = RMSNorm(dec.n_embd, eps)
        self.self_attention = DiaAttention(
            cfg, dec.n_embd, dec.n_embd, dec.gqa_query_heads, dec.kv_heads,
            dec.gqa_head_dim, out_embed_dim=dec.n_embd,
        )
        self.cross_attention = DiaAttention(
            cfg, dec.n_embd, enc.n_embd, dec.cross_query_heads,
            dec.cross_query_heads, dec.cross_head_dim, is_cross_attn=True,
            out_embed_dim=dec.n_embd,
        )
        self.mlp = MlpBlock(dec.n_embd, dec.n_hidden)

    def step(self, x, tgt_positions, sa_cache, cross_kv, sa_mask, ca_mask):
        sa_out, sa_cache = self.self_attention.self_cached(
            self.pre_sa_norm(x), tgt_positions, sa_cache, sa_mask
        )
        x = x + sa_out
        x = x + self.cross_attention.cross_step(
            self.pre_ca_norm(x), tgt_positions, cross_kv, ca_mask
        )
        x = x + self.mlp(self.pre_mlp_norm(x))
        return x, sa_cache


class DiaDecoder(Module):
    def __init__(self, cfg: DiaConfig):
        dec = cfg.model.decoder
        data = cfg.data
        self.num_channels = data.channels
        self.num_layers = dec.n_layer
        self.num_query_heads = dec.gqa_query_heads
        self.num_kv_heads = dec.kv_heads
        self.head_dim = dec.gqa_head_dim
        self.embeddings = [
            Embedding(cfg.model.tgt_vocab_size, dec.n_embd)
            for _ in range(self.num_channels)
        ]
        self.layers = [DecoderLayer(cfg) for _ in range(self.num_layers)]
        self.norm = RMSNorm(dec.n_embd, cfg.model.normalization_layer_epsilon)
        self.logits_dense = DenseGeneral(
            (dec.n_embd,), (self.num_channels, cfg.model.tgt_vocab_size)
        )

    def embed(self, tgt_ids):
        """tgt_ids [B, T, C] -> summed channel embeddings [B, T, D]."""
        x = 0
        for i in range(self.num_channels):
            x = x + self.embeddings[i](tgt_ids[:, :, i])
        return x

    def init_cache(self, batch: int, max_len: int, dtype=jnp.float32) -> list:
        # caches store the UNEXPANDED kv heads (4x smaller than the
        # reference's pre-repeated layout for the 16q/4kv decoder)
        return [
            KVCache.create(batch, self.num_kv_heads, max_len, self.head_dim,
                           dtype)
            for _ in self.layers
        ]

    def precompute_cross_kv(self, encoder_out, src_positions) -> list:
        return [
            layer.cross_attention.precompute_cross_kv(encoder_out, src_positions)
            for layer in self.layers
        ]

    def step(self, tgt_ids, tgt_positions, sa_caches, cross_kvs, sa_mask,
             ca_mask):
        """tgt_ids [B, S, C] -> (logits [B, S, C, V], caches)."""
        x = self.embed(tgt_ids)
        new_caches = []
        for layer, cache, cross_kv in zip(self.layers, sa_caches, cross_kvs):
            x, cache = layer.step(x, tgt_positions, cache, cross_kv, sa_mask,
                                  ca_mask)
            new_caches.append(cache)
        x = self.norm(x)
        return self.logits_dense(x.astype(jnp.float32)), new_caches
