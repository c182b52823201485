"""Bark's GPT stacks (semantic / coarse causal GPT + non-causal FineGPT).

Capability parity with /root/reference/mlx_audio/tts/models/bark/bark.py:
121-392, with functional KV caches and prefill/step split for jitted decode
loops (the reference concatenates past_kv tuples per step).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.models.base import BaseModelArgs
from mlx_audio_tpu.nn import Embedding, KVCache, LayerNorm, Linear, Module


@dataclass
class GPTConfig(BaseModelArgs):
    block_size: int = 1024
    input_vocab_size: int = 129600
    output_vocab_size: int = 129600
    n_layer: int = 12
    n_head: int = 12
    n_embd: int = 768
    bias: bool = False
    model_type: str = "semantic"
    dropout: float = 0.0
    n_codes_total: int = 8
    n_codes_given: int = 1

    # HF-transformers BarkConfig field names (suno/bark config.json) →
    # the suno-native names this dataclass uses.
    _HF_ALIASES = {
        "num_layers": "n_layer",
        "num_heads": "n_head",
        "hidden_size": "n_embd",
    }

    @classmethod
    def from_dict(cls, params: dict):
        params = {cls._HF_ALIASES.get(k, k): v for k, v in params.items()}
        return super(GPTConfig, cls).from_dict(params)


class CausalSelfAttention(Module):
    def __init__(self, cfg: GPTConfig):
        self.n_head = cfg.n_head
        self.head_dim = cfg.n_embd // cfg.n_head
        self.att_proj = Linear(cfg.n_embd, 3 * cfg.n_embd, bias=cfg.bias)
        self.out_proj = Linear(cfg.n_embd, cfg.n_embd, bias=cfg.bias)

    def _split(self, x):
        b, t, _ = x.shape
        return x.reshape(b, t, self.n_head, self.head_dim).transpose(0, 2, 1, 3)

    def _merge(self, x):
        b, h, t, d = x.shape
        return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)

    def __call__(self, x, cache: KVCache, mask):
        q, k, v = jnp.split(self.att_proj(x), 3, axis=2)
        q, k, v = self._split(q), self._split(k), self._split(v)
        cache = cache.update(k, v)
        scale = self.head_dim ** -0.5
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, cache.k).astype(jnp.float32) * scale
        scores = scores + mask
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, cache.v)
        return self.out_proj(self._merge(out)), cache

    def full(self, x, causal: bool = True):
        q, k, v = jnp.split(self.att_proj(x), 3, axis=2)
        q, k, v = self._split(q), self._split(k), self._split(v)
        scale = self.head_dim ** -0.5
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
        if causal:
            t = x.shape[1]
            i = jnp.arange(t)[:, None]
            j = jnp.arange(t)[None, :]
            scores = jnp.where(j <= i, scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        return self.out_proj(self._merge(out))


class MLP(Module):
    def __init__(self, cfg: GPTConfig):
        # suno checkpoints ship bias-free MLPs; HF-transformers Bark
        # (modeling_bark.BarkMLP) honors config.bias — follow the config.
        self.in_proj = Linear(cfg.n_embd, 4 * cfg.n_embd, bias=cfg.bias)
        self.out_proj = Linear(4 * cfg.n_embd, cfg.n_embd, bias=cfg.bias)

    def __call__(self, x):
        return self.out_proj(jax.nn.gelu(self.in_proj(x), approximate=False))


class Block(Module):
    def __init__(self, cfg: GPTConfig):
        self.layernorm_1 = LayerNorm(cfg.n_embd, affine=True)
        self.layernorm_2 = LayerNorm(cfg.n_embd, affine=True)
        # bark uses bias-free LayerNorm for causal stages
        if not cfg.bias:
            self.layernorm_1.bias = jnp.zeros((cfg.n_embd,))
            self.layernorm_2.bias = jnp.zeros((cfg.n_embd,))
        self.attn = CausalSelfAttention(cfg)
        self.mlp = MLP(cfg)

    def __call__(self, x, cache, mask):
        attn, cache = self.attn(self.layernorm_1(x), cache, mask)
        x = x + attn
        x = x + self.mlp(self.layernorm_2(x))
        return x, cache


class GPT(Module):
    """Causal GPT with learned positions (semantic / coarse stages)."""

    def __init__(self, cfg: GPTConfig):
        self.cfg_n_head = cfg.n_head
        self.cfg_head_dim = cfg.n_embd // cfg.n_head
        self.block_size = cfg.block_size
        self.input_embeds_layer = Embedding(cfg.input_vocab_size, cfg.n_embd)
        self.position_embeds_layer = Embedding(cfg.block_size, cfg.n_embd)
        self.layers = [Block(cfg) for _ in range(cfg.n_layer)]
        self.layernorm_final = LayerNorm(cfg.n_embd, affine=True)
        if not cfg.bias:
            self.layernorm_final.bias = jnp.zeros((cfg.n_embd,))
        self.lm_head = Linear(cfg.n_embd, cfg.output_vocab_size, bias=False)

    def init_cache(self, batch: int, max_len: int, dtype=jnp.float32) -> list:
        return [
            KVCache.create(batch, self.cfg_n_head, max_len, self.cfg_head_dim, dtype)
            for _ in self.layers
        ]

    def prefill(self, caches: list, embeds: jax.Array, n_valid: jax.Array):
        """RIGHT-padded prompt embeddings [B, Lb, D]; positions 0..Lb-1.
        Returns (last-valid-position logits [B, V], caches rewound to n)."""
        b, lb, _ = embeds.shape
        x = embeds + self.position_embeds_layer(jnp.arange(lb))[None]
        max_len = caches[0].k.shape[-2]
        i = jnp.arange(lb)[:, None]
        j = jnp.arange(max_len)[None, :]
        mask = jnp.where((j <= i) & (j < lb), 0.0, -1e9).astype(jnp.float32)
        new_caches = []
        for layer, cache in zip(self.layers, caches):
            x, cache = layer(x, cache, mask)
            new_caches.append(cache._replace(idx=n_valid.astype(jnp.int32)))
        x = self.layernorm_final(x)
        h_last = x[jnp.arange(b), n_valid - 1]
        return self.lm_head(h_last), new_caches

    def step(self, caches: list, token: jax.Array):
        """One token [B, 1] at position caches.idx -> (logits [B, V], caches)."""
        pos = caches[0].idx
        x = self.input_embeds_layer(token) + self.position_embeds_layer(pos)[None, None]
        max_len = caches[0].k.shape[-2]
        j = jnp.arange(max_len)[None, None, None, :]
        mask = jnp.where(j <= pos, 0.0, -1e9).astype(jnp.float32)
        new_caches = []
        for layer, cache in zip(self.layers, caches):
            x, cache = layer(x, cache, mask)
            new_caches.append(cache)
        x = self.layernorm_final(x)
        return self.lm_head(x[:, -1]), new_caches


class FineBlock(Module):
    def __init__(self, cfg: GPTConfig):
        self.layernorm_1 = LayerNorm(cfg.n_embd)
        self.layernorm_2 = LayerNorm(cfg.n_embd)
        self.attn = CausalSelfAttention(cfg)
        self.mlp = MLP(cfg)

    def __call__(self, x):
        x = x + self.attn.full(self.layernorm_1(x), causal=False)
        x = x + self.mlp(self.layernorm_2(x))
        return x


class FineGPT(Module):
    """Non-causal fine stage: per-codebook embeddings summed up to the
    predicted codebook, per-codebook heads (bark.py:344-391)."""

    def __init__(self, cfg: GPTConfig):
        self.n_codes_total = cfg.n_codes_total
        self.n_codes_given = cfg.n_codes_given
        self.block_size = cfg.block_size
        self.input_embeds_layers = [
            Embedding(cfg.input_vocab_size, cfg.n_embd)
            for _ in range(cfg.n_codes_total)
        ]
        self.position_embeds_layer = Embedding(cfg.block_size, cfg.n_embd)
        self.layers = [FineBlock(cfg) for _ in range(cfg.n_layer)]
        self.layernorm_final = LayerNorm(cfg.n_embd)
        self.lm_heads = [
            Linear(cfg.n_embd, cfg.output_vocab_size, bias=False)
            for _ in range(cfg.n_codes_given, cfg.n_codes_total)
        ]

    def __call__(self, pred_idx: int, idx: jax.Array) -> jax.Array:
        """idx: [B, T, n_codes_total] -> logits [B, T, V] for codebook
        pred_idx (static)."""
        b, t, codes = idx.shape
        pos = jnp.arange(t)
        x = 0
        for i in range(pred_idx + 1):
            x = x + self.input_embeds_layers[i](idx[:, :, i])
        x = x + self.position_embeds_layer(pos)[None]
        for block in self.layers:
            x = block(x)
        x = self.layernorm_final(x)
        return self.lm_heads[pred_idx - self.n_codes_given](x)
