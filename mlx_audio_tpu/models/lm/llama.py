"""Generic JAX Llama — the LLM backbone shared by CSM, Orpheus, OuteTTS,
Spark and Voxtral (the reference delegates to mlx_lm.models.llama; here it
is first-class, TPU-first).

Design:

* Decode state is a list of fixed-capacity functional KV caches
  (nn.attention.KVCache) threaded through jitted prefill/step functions.
* Prompts are LEFT-padded to shape buckets: every cache slot below
  ``pad_len`` is masked out.  RoPE is relative, so the constant position
  shift leaves attention scores over valid tokens unchanged.
* Supports direct-embedding input (CSM feeds fused audio+text embeddings,
  reference sesame.py:298-299 swaps embed_tokens for Identity).
* TP-ready: weights are plain pytree leaves; shard q/k/v/gate/up on the
  output dim and o/down on the input dim over a 'model' mesh axis.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp

from mlx_audio_tpu.nn import (
    Embedding,
    KVCache,
    Linear,
    Module,
    RMSNorm,
    apply_rope,
    rope_table,
    scaled_dot_product_attention,
)


@dataclass
class LlamaConfig:
    num_hidden_layers: int
    num_attention_heads: int
    num_key_value_heads: int
    head_dim: int
    hidden_size: int
    intermediate_size: int
    rms_norm_eps: float
    vocab_size: int
    max_position_embeddings: int = 2048
    attention_bias: bool = False
    mlp_bias: bool = False
    rope_theta: float = 10000.0
    rope_scaling: Optional[dict] = None
    tie_word_embeddings: bool = False
    # Qwen2: bias on q/k/v only; Qwen3: per-head RMS norm on q/k
    qkv_bias: bool = False
    use_qk_norm: bool = False


class LlamaAttention(Module):
    def __init__(self, cfg: LlamaConfig):
        self.num_heads = cfg.num_attention_heads
        self.num_kv_heads = cfg.num_key_value_heads
        self.head_dim = cfg.head_dim
        inner = cfg.num_attention_heads * cfg.head_dim
        inner_kv = cfg.num_key_value_heads * cfg.head_dim
        qkv_bias = cfg.attention_bias or cfg.qkv_bias
        self.q_proj = Linear(cfg.hidden_size, inner, bias=qkv_bias)
        self.k_proj = Linear(cfg.hidden_size, inner_kv, bias=qkv_bias)
        self.v_proj = Linear(cfg.hidden_size, inner_kv, bias=qkv_bias)
        self.o_proj = Linear(inner, cfg.hidden_size, bias=cfg.attention_bias)
        if cfg.use_qk_norm:
            self.q_norm = RMSNorm(cfg.head_dim, cfg.rms_norm_eps)
            self.k_norm = RMSNorm(cfg.head_dim, cfg.rms_norm_eps)
        else:
            self.q_norm = None
            self.k_norm = None

    def _split(self, x, heads):
        b, l, _ = x.shape
        return x.reshape(b, l, heads, self.head_dim).transpose(0, 2, 1, 3)

    def _merge(self, x):
        b, h, l, d = x.shape
        return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)

    def __call__(self, x, rope, positions, mask, cache: Optional[KVCache] = None):
        q = self._split(self.q_proj(x), self.num_heads)
        k = self._split(self.k_proj(x), self.num_kv_heads)
        v = self._split(self.v_proj(x), self.num_kv_heads)
        if self.q_norm is not None:
            q = self.q_norm(q)
            k = self.k_norm(k)
        cos, sin = rope
        q = apply_rope(q, cos, sin, positions)
        k = apply_rope(k, cos, sin, positions)
        if cache is not None:
            cache = cache.update(k, v)
            k, v = cache.k, cache.v
        out = scaled_dot_product_attention(q, k, v, mask)
        return self.o_proj(self._merge(out)), cache


class LlamaMLP(Module):
    def __init__(self, cfg: LlamaConfig):
        self.gate_proj = Linear(cfg.hidden_size, cfg.intermediate_size, bias=cfg.mlp_bias)
        self.up_proj = Linear(cfg.hidden_size, cfg.intermediate_size, bias=cfg.mlp_bias)
        self.down_proj = Linear(cfg.intermediate_size, cfg.hidden_size, bias=cfg.mlp_bias)

    def __call__(self, x):
        return self.down_proj(jax.nn.silu(self.gate_proj(x)) * self.up_proj(x))


class LlamaBlock(Module):
    def __init__(self, cfg: LlamaConfig):
        self.self_attn = LlamaAttention(cfg)
        self.mlp = LlamaMLP(cfg)
        self.input_layernorm = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps)
        self.post_attention_layernorm = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps)

    def __call__(self, x, rope, positions, mask, cache=None):
        attn, cache = self.self_attn(self.input_layernorm(x), rope, positions,
                                     mask, cache)
        x = x + attn
        x = x + self.mlp(self.post_attention_layernorm(x))
        return x, cache


class LlamaModel(Module):
    """Embedding + transformer stack (no LM head — models add their own)."""

    def __init__(self, cfg: LlamaConfig, use_embed_tokens: bool = True):
        self.cfg_num_layers = cfg.num_hidden_layers
        self.head_dim = cfg.head_dim
        self.num_kv_heads = cfg.num_key_value_heads
        self.max_position_embeddings = cfg.max_position_embeddings
        self.embed_tokens = (
            Embedding(cfg.vocab_size, cfg.hidden_size) if use_embed_tokens else None
        )
        self.layers = [LlamaBlock(cfg) for _ in range(cfg.num_hidden_layers)]
        self.norm = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps)
        cos, sin = rope_table(
            cfg.head_dim,
            cfg.max_position_embeddings,
            base=cfg.rope_theta,
            scaling=cfg.rope_scaling,
        )
        self.rope_cos = cos
        self.rope_sin = sin

    # -- cache management --------------------------------------------------

    def init_cache(self, batch: int, max_len: Optional[int] = None,
                   dtype=jnp.float32) -> list:
        max_len = max_len or self.max_position_embeddings
        return [
            KVCache.create(batch, self.num_kv_heads, max_len, self.head_dim, dtype)
            for _ in self.layers
        ]

    # -- forward paths -----------------------------------------------------

    def _embed(self, x):
        if self.embed_tokens is not None and jnp.issubdtype(x.dtype, jnp.integer):
            return self.embed_tokens(x)
        return x

    def __call__(self, x, positions=None, mask=None):
        """Full-sequence causal forward (no cache).  x: ids [B, T] or embeds
        [B, T, D]."""
        h = self._embed(x)
        t = h.shape[1]
        if positions is None:
            positions = jnp.arange(t)
        if mask is None:
            i = jnp.arange(t)[:, None]
            j = jnp.arange(t)[None, :]
            mask = jnp.where(j <= i, 0.0, -1e9).astype(jnp.float32)
        rope = (self.rope_cos, self.rope_sin)
        for layer in self.layers:
            h, _ = layer(h, rope, positions, mask)
        return self.norm(h)

    def prefill(self, caches: list, x, pad_len) -> tuple[jax.Array, list]:
        """Process a LEFT-padded prompt [B, T(, D)], writing cache slots
        [0, T); slots below ``pad_len`` [B] are masked everywhere.

        Returns (hidden [B, T, D], caches).  Caller continues with `step`.
        """
        h = self._embed(x)
        b, t = h.shape[:2]
        max_len = caches[0].k.shape[-2]
        positions = jnp.arange(t)
        i = jnp.arange(t)[:, None]
        j = jnp.arange(max_len)[None, :]
        causal = (j <= i) & (j < t)
        valid_key = j[None] >= pad_len[:, None, None]  # [B, 1, max_len]
        mask = jnp.where(causal[None] & valid_key, 0.0, -1e9)[:, None]  # [B,1,t,max_len]
        rope = (self.rope_cos, self.rope_sin)
        new_caches = []
        for layer, cache in zip(self.layers, caches):
            h, cache = layer(h, rope, positions, mask, cache)
            new_caches.append(cache)
        return self.norm(h), new_caches

    def step(self, caches: list, x, pad_len) -> tuple[jax.Array, list]:
        """One (or few) token decode step.  x: ids [B, S] or embeds [B, S, D];
        attends to cache slots [pad_len, idx+S)."""
        h = self._embed(x)
        b, s = h.shape[:2]
        max_len = caches[0].k.shape[-2]
        idx = caches[0].idx
        positions = idx + jnp.arange(s)
        j = jnp.arange(max_len)[None, None, :]  # [1, 1, max_len]
        qpos = positions[None, :, None]          # [1, S, 1]
        valid = (j >= pad_len[:, None, None]) & (j <= qpos)
        mask = jnp.where(valid, 0.0, -1e9)[:, None]  # [B, 1, S, max_len]
        rope = (self.rope_cos, self.rope_sin)
        new_caches = []
        for layer, cache in zip(self.layers, caches):
            h, cache = layer(h, rope, positions, mask, cache)
            new_caches.append(cache)
        return self.norm(h), new_caches


LLAMA_FLAVORS = {
    # reference sesame.py:225-273
    "llama-1B": LlamaConfig(
        num_hidden_layers=16, num_attention_heads=32, num_key_value_heads=8,
        head_dim=64, hidden_size=2048, intermediate_size=8192,
        rms_norm_eps=1e-5, vocab_size=128_256, max_position_embeddings=2048,
        rope_theta=500_000,
        rope_scaling={
            "factor": 32.0, "low_freq_factor": 1.0, "high_freq_factor": 4.0,
            "original_max_position_embeddings": 8192, "rope_type": "llama3",
        },
    ),
    "llama-100M": LlamaConfig(
        num_hidden_layers=4, num_attention_heads=8, num_key_value_heads=2,
        head_dim=128, hidden_size=1024, intermediate_size=8192,
        rms_norm_eps=1e-5, vocab_size=128_256, max_position_embeddings=2048,
        rope_theta=500_000,
        rope_scaling={
            "factor": 32.0, "low_freq_factor": 1.0, "high_freq_factor": 4.0,
            "original_max_position_embeddings": 8192, "rope_type": "llama3",
        },
    ),
}
