"""Whisper encoder/decoder graph, TPU-first.

Parity with /root/reference/mlx_audio/stt/models/whisper/whisper.py:90-354:
conv+transformer audio encoder with sinusoidal positions, text decoder with
learned absolute positions and cross-attention.  Decode state is a list of
functional KV caches; prompts are RIGHT-padded to length buckets (learned
absolute positions forbid left-padding) with the cache write index rewound
to the LAST valid slot after prefill (the decode loops re-feed the final
prompt token, overwriting that slot in place).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.nn import (
    Conv1d,
    Embedding,
    KVCache,
    LayerNorm,
    Linear,
    Module,
)


@dataclass
class ModelDimensions:
    n_mels: int
    n_audio_ctx: int
    n_audio_state: int
    n_audio_head: int
    n_audio_layer: int
    n_vocab: int
    n_text_ctx: int
    n_text_state: int
    n_text_head: int
    n_text_layer: int

    @classmethod
    def from_dict(cls, params: dict) -> "ModelDimensions":
        return cls(**{k: v for k, v in params.items()
                      if k in cls.__annotations__})


def sinusoids(length: int, channels: int, max_timescale: float = 10000) -> np.ndarray:
    assert channels % 2 == 0
    log_inc = math.log(max_timescale) / (channels // 2 - 1)
    inv = np.exp(-log_inc * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1)


class WhisperAttention(Module):
    """Whisper layout: query/key/value/out, key has no bias (whisper.py:90)."""

    def __init__(self, n_state: int, n_head: int):
        self.n_head = n_head
        self.head_dim = n_state // n_head
        self.query = Linear(n_state, n_state)
        self.key = Linear(n_state, n_state, bias=False)
        self.value = Linear(n_state, n_state)
        self.out = Linear(n_state, n_state)

    def _split(self, x):
        b, l, _ = x.shape
        return x.reshape(b, l, self.n_head, self.head_dim).transpose(0, 2, 1, 3)

    def _merge(self, x):
        b, h, l, d = x.shape
        return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)

    def _attend(self, q, k, v, mask=None, return_qk=False):
        scale = self.head_dim ** -0.5
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
        if mask is not None:
            scores = scores + mask
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        return self.out(self._merge(out)), (scores if return_qk else None)

    def self_full(self, x, mask=None):
        q, k, v = self._split(self.query(x)), self._split(self.key(x)), self._split(self.value(x))
        return self._attend(q, k, v, mask)[0]

    def self_cached(self, cache: KVCache, x, mask, origins=None):
        """Append x's keys/values to the cache and attend with the given
        additive mask over the full buffer.

        origins [B, max_len] (beam search): per (row, position) index of
        the physical row whose K/V holds this row's history at that
        position.  Beam reorders then cost ONE [B, L] int map instead of a
        full physical cache copy per step — the attention read gathers
        lazily (reading the same bytes it would read anyway)."""
        q = self._split(self.query(x))
        k = self._split(self.key(x))
        v = self._split(self.value(x))
        cache = cache.update(k, v)
        kk, vv = cache.k, cache.v
        if origins is not None:
            idx = origins[:, None, :, None]
            kk = jnp.take_along_axis(kk, idx, axis=0)
            vv = jnp.take_along_axis(vv, idx, axis=0)
        out, _ = self._attend(q, kk, vv, mask)
        return out, cache

    def cross(self, x, k, v, return_qk=False):
        q = self._split(self.query(x))
        return self._attend(q, k, v, None, return_qk)

    def cross_kv(self, xa):
        return self._split(self.key(xa)), self._split(self.value(xa))


class ResidualAttentionBlock(Module):
    def __init__(self, n_state: int, n_head: int, cross_attention: bool = False):
        self.attn = WhisperAttention(n_state, n_head)
        self.attn_ln = LayerNorm(n_state)
        self.cross_attn = WhisperAttention(n_state, n_head) if cross_attention else None
        self.cross_attn_ln = LayerNorm(n_state) if cross_attention else None
        self.mlp1 = Linear(n_state, n_state * 4)
        self.mlp2 = Linear(n_state * 4, n_state)
        self.mlp_ln = LayerNorm(n_state)

    def encoder_call(self, x):
        x = x + self.attn.self_full(self.attn_ln(x))
        x = x + self.mlp2(jax.nn.gelu(self.mlp1(self.mlp_ln(x)), approximate=False))
        return x

    def decoder_call(self, x, cache, mask, cross_k, cross_v, return_qk=False,
                     origins=None):
        y, cache = self.attn.self_cached(cache, self.attn_ln(x), mask,
                                         origins=origins)
        x = x + y
        y, qk = self.cross_attn.cross(self.cross_attn_ln(x), cross_k, cross_v,
                                      return_qk)
        x = x + y
        x = x + self.mlp2(jax.nn.gelu(self.mlp1(self.mlp_ln(x)), approximate=False))
        return x, cache, qk


class AudioEncoder(Module):
    def __init__(self, n_mels, n_ctx, n_state, n_head, n_layer):
        self.conv1 = Conv1d(n_mels, n_state, kernel_size=3, padding=1)
        self.conv2 = Conv1d(n_state, n_state, kernel_size=3, stride=2, padding=1)
        self.positional_embedding = jnp.asarray(
            sinusoids(n_ctx, n_state), dtype=jnp.float32
        )
        self.blocks = [ResidualAttentionBlock(n_state, n_head) for _ in range(n_layer)]
        self.ln_post = LayerNorm(n_state)

    def __call__(self, x: jax.Array) -> jax.Array:
        """x: [B, n_frames, n_mels] (NLC) -> [B, n_audio_ctx, n_state]."""
        x = jax.nn.gelu(self.conv1(x), approximate=False)
        x = jax.nn.gelu(self.conv2(x), approximate=False)
        x = x + self.positional_embedding.astype(x.dtype)
        for block in self.blocks:
            x = block.encoder_call(x)
        return self.ln_post(x)


class TextDecoder(Module):
    def __init__(self, n_vocab, n_ctx, n_state, n_head, n_layer):
        self.n_ctx = n_ctx
        self.token_embedding = Embedding(n_vocab, n_state)
        self.positional_embedding = jnp.zeros((n_ctx, n_state))
        self.blocks = [
            ResidualAttentionBlock(n_state, n_head, cross_attention=True)
            for _ in range(n_layer)
        ]
        self.ln = LayerNorm(n_state)

    # -- cross-attention keys/values are computed once per window ----------

    def compute_cross_kv(self, xa: jax.Array) -> list:
        return [b.cross_attn.cross_kv(xa) for b in self.blocks]

    def init_cache(self, batch: int, max_len: int, dtype=jnp.float32) -> list:
        head_dim = self.positional_embedding.shape[1] // self.blocks[0].attn.n_head
        return [
            KVCache.create(batch, self.blocks[0].attn.n_head, max_len, head_dim, dtype)
            for _ in self.blocks
        ]

    def full_forward(self, tokens: jax.Array, xa: jax.Array,
                     return_cross_qk: bool = False):
        """Plain causal forward over the whole token sequence (used for
        alignment/cross-qk extraction, cf. forward_with_cross_qk)."""
        t = tokens.shape[1]
        x = self.token_embedding(tokens) + self.positional_embedding[:t]
        i = jnp.arange(t)[:, None]
        j = jnp.arange(t)[None, :]
        mask = jnp.where(j <= i, 0.0, -1e9).astype(jnp.float32)
        cross_kv = self.compute_cross_kv(xa)
        caches = self.init_cache(tokens.shape[0], t, dtype=x.dtype)
        qks = []
        for block, cache, (ck, cv) in zip(self.blocks, caches, cross_kv):
            x, _, qk = block.decoder_call(x, cache, mask, ck, cv, return_cross_qk)
            qks.append(qk)
        x = self.ln(x)
        logits = self.token_embedding.as_linear(x)
        return (logits, qks) if return_cross_qk else logits

    def prefill(self, caches: list, tokens: jax.Array, n_valid: jax.Array,
                cross_kv: list):
        """RIGHT-padded prompt [B, Lb]; valid length n_valid [B] (scalar per
        row).  Returns hidden [B, Lb, D] and caches with idx rewound to the
        LAST valid slot (n_valid - 1): the decode loops re-feed tokens[t-1]
        on their first step, which must overwrite that slot in place —
        appending instead shifts every generated position by one (the
        off-by-one the beam-search golden caught)."""
        b, lb = tokens.shape
        x = self.token_embedding(tokens) + self.positional_embedding[:lb]
        max_len = caches[0].k.shape[-2]
        i = jnp.arange(lb)[:, None]
        j = jnp.arange(max_len)[None, :]
        mask = jnp.where((j <= i) & (j < lb), 0.0, -1e9).astype(jnp.float32)
        new_caches = []
        for block, cache, (ck, cv) in zip(self.blocks, caches, cross_kv):
            x, cache, _ = block.decoder_call(x, cache, mask, ck, cv)
            # Rewind the write index to the LAST valid prompt slot: the
            # decode loops (decoding.py) re-feed tokens[t-1] on their first
            # step, so that step must overwrite slot n_valid-1 with the
            # identical token/position rather than append a duplicate at
            # n_valid (which shifted every generated position by one).
            new_caches.append(
                cache._replace(idx=n_valid.astype(jnp.int32) - 1)
            )
        return self.ln(x), new_caches

    def step(self, caches: list, tokens: jax.Array, cross_kv: list,
             origins=None):
        """One decode step: tokens [B, 1] at position caches.idx.  origins
        [B, max_len]: lazy beam-reorder map (see self_cached)."""
        pos = caches[0].idx
        x = self.token_embedding(tokens) + jax.lax.dynamic_slice(
            self.positional_embedding, (pos, 0), (1, self.positional_embedding.shape[1])
        )
        max_len = caches[0].k.shape[-2]
        j = jnp.arange(max_len)[None, None, None, :]
        mask = jnp.where(j <= pos, 0.0, -1e9).astype(jnp.float32)
        new_caches = []
        for block, cache, (ck, cv) in zip(self.blocks, caches, cross_kv):
            x, cache, _ = block.decoder_call(x, cache, mask, ck, cv,
                                             origins=origins)
            new_caches.append(cache)
        x = self.ln(x)
        return self.token_embedding.as_linear(x)[:, -1], new_caches


class WhisperModel(Module):
    """Encoder + decoder graph (the host-side transcription driver lives in
    transcribe.py)."""

    def __init__(self, dims: ModelDimensions):
        self.dims = dims
        self.encoder = AudioEncoder(
            dims.n_mels, dims.n_audio_ctx, dims.n_audio_state,
            dims.n_audio_head, dims.n_audio_layer,
        )
        self.decoder = TextDecoder(
            dims.n_vocab, dims.n_text_ctx, dims.n_text_state,
            dims.n_text_head, dims.n_text_layer,
        )
        all_heads = np.zeros((dims.n_text_layer, dims.n_text_head), dtype=bool)
        all_heads[dims.n_text_layer // 2:] = True
        self.alignment_heads = jnp.asarray(np.asarray(all_heads.nonzero()).T)

    @property
    def is_multilingual(self):
        return self.dims.n_vocab >= 51865

    @property
    def num_languages(self):
        return self.dims.n_vocab - 51765 - int(self.is_multilingual)

    def embed_audio(self, mel):
        return self.encoder(mel)

    def sanitize(self, weights: dict) -> dict:
        """MLX whisper checkpoints use NLC conv layout [O, K, I] -> ours
        [K, I, O]; torch uses [O, I, K].  HF-transformers `WhisperModel`
        checkpoints (openai/whisper-* hub format: encoder.layers.N.self_attn
        naming) are auto-detected and remapped to the OpenAI layout."""
        from mlx_audio_tpu.models.base import check_array_shape

        if any(".self_attn.q_proj." in k for k in weights):
            weights = sanitize_hf_whisper(weights)
        out = {}
        for k, v in weights.items():
            v = np.asarray(v)
            if k.endswith(".conv1.weight") or k.endswith(".conv2.weight"):
                if check_array_shape(v):      # MLX [O, K, I]
                    v = v.transpose(1, 2, 0)
                else:                          # torch [O, I, K]
                    v = v.transpose(2, 1, 0)
            if k.endswith("_positional_embedding"):
                k = k.replace("_positional_embedding", "positional_embedding")
            out[k] = v
        return out


def sanitize_hf_whisper(weights: dict) -> dict:
    """Map HF-transformers Whisper keys (openai/whisper-* hub format) to the
    OpenAI layout this model uses.  Conv weights stay torch [O, I, K] here;
    the caller's layout pass transposes them.  The sinusoidal encoder
    embed_positions and the tied proj_out are dropped (recomputed / tied).
    Golden parity in tests/test_golden_hf.py."""
    rules = (
        (".self_attn.q_proj.", ".attn.query."),
        (".self_attn.k_proj.", ".attn.key."),
        (".self_attn.v_proj.", ".attn.value."),
        (".self_attn.out_proj.", ".attn.out."),
        (".encoder_attn.q_proj.", ".cross_attn.query."),
        (".encoder_attn.k_proj.", ".cross_attn.key."),
        (".encoder_attn.v_proj.", ".cross_attn.value."),
        (".encoder_attn.out_proj.", ".cross_attn.out."),
        (".self_attn_layer_norm.", ".attn_ln."),
        (".encoder_attn_layer_norm.", ".cross_attn_ln."),
        (".fc1.", ".mlp1."),
        (".fc2.", ".mlp2."),
        (".final_layer_norm.", ".mlp_ln."),
    )
    out = {}
    for k, v in weights.items():
        k = k.removeprefix("model.")
        if k.startswith("proj_out.") or k == "encoder.embed_positions.weight":
            continue  # tied to token_embedding / fixed sinusoids
        k = k.replace(".layers.", ".blocks.")
        for old, new in rules:
            k = k.replace(old, new)
        if k == "decoder.embed_tokens.weight":
            k = "decoder.token_embedding.weight"
        elif k == "decoder.embed_positions.weight":
            k = "decoder.positional_embedding"
        elif k == "encoder.layer_norm.weight":
            k = "encoder.ln_post.weight"
        elif k == "encoder.layer_norm.bias":
            k = "encoder.ln_post.bias"
        elif k == "decoder.layer_norm.weight":
            k = "decoder.ln.weight"
        elif k == "decoder.layer_norm.bias":
            k = "decoder.ln.bias"
        out[k] = np.asarray(v)
    return out
