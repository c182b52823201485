"""PLBERT: the ALBERT phoneme encoder used by Kokoro.

Capability parity with the reference's CustomAlbert
(/root/reference/mlx_audio/tts/models/kokoro/modules.py:418-659): shared
cross-layer weights (num_hidden_groups), post-LN attention blocks, pooled
[CLS] output.  Layout is NLC throughout; attention masks are additive.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp

from mlx_audio_tpu.models.base import BaseModelArgs
from mlx_audio_tpu.nn import (
    Embedding,
    LayerNorm,
    Linear,
    Module,
    MultiHeadAttention,
)


@dataclass
class AlbertModelArgs(BaseModelArgs):
    num_hidden_layers: int
    num_attention_heads: int
    hidden_size: int
    intermediate_size: int
    max_position_embeddings: int
    model_type: str = "albert"
    embedding_size: int = 128
    inner_group_num: int = 1
    num_hidden_groups: int = 1
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    type_vocab_size: int = 2
    initializer_range: float = 0.02
    layer_norm_eps: float = 1e-12
    vocab_size: int = 30522
    dropout: float = 0.0


class AlbertEmbeddings(Module):
    def __init__(self, config: AlbertModelArgs):
        self.word_embeddings = Embedding(config.vocab_size, config.embedding_size)
        self.position_embeddings = Embedding(
            config.max_position_embeddings, config.embedding_size
        )
        self.token_type_embeddings = Embedding(
            config.type_vocab_size, config.embedding_size
        )
        self.LayerNorm = LayerNorm(config.embedding_size, eps=config.layer_norm_eps)

    def __call__(self, input_ids, token_type_ids=None):
        seq_length = input_ids.shape[1]
        position_ids = jnp.arange(seq_length)[None, :]
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        emb = (
            self.word_embeddings(input_ids)
            + self.position_embeddings(position_ids)
            + self.token_type_embeddings(token_type_ids)
        )
        return self.LayerNorm(emb)


class AlbertSelfAttention(Module):
    """Post-LN self-attention; weight names mirror the HF/ref checkpoint
    (query/key/value/dense + LayerNorm)."""

    def __init__(self, config: AlbertModelArgs):
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        self.query = Linear(config.hidden_size, config.hidden_size)
        self.key = Linear(config.hidden_size, config.hidden_size)
        self.value = Linear(config.hidden_size, config.hidden_size)
        self.dense = Linear(config.hidden_size, config.hidden_size)
        self.LayerNorm = LayerNorm(config.hidden_size, eps=config.layer_norm_eps)

    def __call__(self, x, mask=None):
        b, l, _ = x.shape
        def split(t):
            return t.reshape(b, l, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)
        q, k, v = split(self.query(x)), split(self.key(x)), split(self.value(x))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(self.head_dim, dtype=x.dtype)
        )
        if mask is not None:
            scores = scores + mask
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, -1)
        return self.LayerNorm(self.dense(ctx) + x)


class AlbertLayer(Module):
    def __init__(self, config: AlbertModelArgs):
        self.attention = AlbertSelfAttention(config)
        self.full_layer_layer_norm = LayerNorm(
            config.hidden_size, eps=config.layer_norm_eps
        )
        self.ffn = Linear(config.hidden_size, config.intermediate_size)
        self.ffn_output = Linear(config.intermediate_size, config.hidden_size)

    def __call__(self, x, mask=None):
        attn = self.attention(x, mask)
        # HF ALBERT uses exact gelu
        h = self.ffn_output(jax.nn.gelu(self.ffn(attn), approximate=False))
        return self.full_layer_layer_norm(h + attn)


class AlbertLayerGroup(Module):
    def __init__(self, config: AlbertModelArgs):
        self.albert_layers = [AlbertLayer(config) for _ in range(config.inner_group_num)]

    def __call__(self, x, mask=None):
        for layer in self.albert_layers:
            x = layer(x, mask)
        return x


class AlbertEncoder(Module):
    def __init__(self, config: AlbertModelArgs):
        self.num_hidden_layers = config.num_hidden_layers
        self.num_hidden_groups = config.num_hidden_groups
        self.embedding_hidden_mapping_in = Linear(
            config.embedding_size, config.hidden_size
        )
        self.albert_layer_groups = [
            AlbertLayerGroup(config) for _ in range(config.num_hidden_groups)
        ]

    def __call__(self, x, mask=None):
        x = self.embedding_hidden_mapping_in(x)
        for i in range(self.num_hidden_layers):
            group_idx = i * self.num_hidden_groups // self.num_hidden_layers
            x = self.albert_layer_groups[group_idx](x, mask)
        return x


class CustomAlbert(Module):
    def __init__(self, config: AlbertModelArgs):
        self.config = config
        self.embeddings = AlbertEmbeddings(config)
        self.encoder = AlbertEncoder(config)
        self.pooler = Linear(config.hidden_size, config.hidden_size)

    def __call__(self, input_ids, attention_mask=None):
        """attention_mask: [B, L] 1 for valid tokens.  Returns (sequence
        [B, L, H], pooled [B, H])."""
        emb = self.embeddings(input_ids)
        add_mask = None
        if attention_mask is not None:
            add_mask = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * -10000.0
        seq = self.encoder(emb, add_mask)
        pooled = jnp.tanh(self.pooler(seq[:, 0]))
        return seq, pooled
