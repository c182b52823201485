"""Embedding-level GPT-2 decoder stack for IndexTTS.

Capability parity with the reference's use of mlx_lm's GPT2Model with
wte/wpe patched to identity (/root/reference/mlx_audio/tts/models/
indextts/indextts.py:119-136): inputs are pre-built embeddings (learned
text/mel position embeddings are added by the caller), HF gpt2 key names
(h.N.ln_1, attn.c_attn fused QKV, mlp.c_fc, ln_f).

TPU design: functional KVCache pytrees with right-padded prefill + idx
rewind (learned-position models), single-token step for lax.scan decode.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import jax
import jax.numpy as jnp

from mlx_audio_tpu.nn import KVCache, LayerNorm, Linear, Module


@dataclass
class GPT2Args:
    n_embd: int
    n_head: int
    n_layer: int
    layer_norm_epsilon: float = 1e-5


class GPT2Attention(Module):
    def __init__(self, args: GPT2Args):
        self.n_head = args.n_head
        self.head_dim = args.n_embd // args.n_head
        self.c_attn = Linear(args.n_embd, 3 * args.n_embd)
        self.c_proj = Linear(args.n_embd, args.n_embd)

    def _split(self, x):
        b, t, _ = x.shape
        return x.reshape(b, t, self.n_head, self.head_dim).transpose(0, 2, 1, 3)

    def __call__(self, x, cache: KVCache, mask):
        q, k, v = jnp.split(self.c_attn(x), 3, axis=-1)
        q, k, v = self._split(q), self._split(k), self._split(v)
        cache = cache.update(k, v)
        scale = self.head_dim ** -0.5
        scores = (jnp.einsum("bhqd,bhkd->bhqk", q, cache.k)
                  .astype(jnp.float32) * scale)
        scores = scores + mask
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, cache.v)
        b, h, t, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, t, h * d)
        return self.c_proj(out), cache


class GPT2MLP(Module):
    def __init__(self, args: GPT2Args):
        self.c_fc = Linear(args.n_embd, 4 * args.n_embd)
        self.c_proj = Linear(4 * args.n_embd, args.n_embd)

    def __call__(self, x):
        return self.c_proj(jax.nn.gelu(self.c_fc(x), approximate=True))


class GPT2Block(Module):
    def __init__(self, args: GPT2Args):
        self.ln_1 = LayerNorm(args.n_embd, eps=args.layer_norm_epsilon)
        self.attn = GPT2Attention(args)
        self.ln_2 = LayerNorm(args.n_embd, eps=args.layer_norm_epsilon)
        self.mlp = GPT2MLP(args)

    def __call__(self, x, cache, mask):
        attn, cache = self.attn(self.ln_1(x), cache, mask)
        x = x + attn
        x = x + self.mlp(self.ln_2(x))
        return x, cache


class GPT2Model(Module):
    def __init__(self, args: GPT2Args):
        self.n_head = args.n_head
        self.head_dim = args.n_embd // args.n_head
        self.h = [GPT2Block(args) for _ in range(args.n_layer)]
        self.ln_f = LayerNorm(args.n_embd, eps=args.layer_norm_epsilon)

    def init_cache(self, batch: int, max_len: int, dtype=jnp.float32) -> list:
        return [
            KVCache.create(batch, self.n_head, max_len, self.head_dim, dtype)
            for _ in self.h
        ]

    def prefill(self, caches: List[KVCache], embeds: jax.Array,
                n_valid: jax.Array):
        """RIGHT-padded prompt embeddings [B, Lb, D] -> (hidden at last valid
        position [B, D] after ln_f, caches rewound to n_valid)."""
        b, lb, _ = embeds.shape
        max_len = caches[0].k.shape[-2]
        i = jnp.arange(lb)[:, None]
        j = jnp.arange(max_len)[None, :]
        mask = jnp.where((j <= i) & (j < lb), 0.0, -1e9).astype(jnp.float32)
        x = embeds
        new_caches = []
        for layer, cache in zip(self.h, caches):
            x, cache = layer(x, cache, mask)
            new_caches.append(cache._replace(idx=n_valid.astype(jnp.int32)))
        x = self.ln_f(x)
        return x[jnp.arange(b), n_valid - 1], new_caches

    def prefill_left(self, caches: List[KVCache], embeds: jax.Array,
                     pad_len: jax.Array):
        """LEFT-padded prompt embeddings [B, Lb, D] (row b's prompt occupies
        slots [pad_len[b], Lb)) -> (hidden at the shared frontier Lb-1
        [B, D] after ln_f, caches at idx=Lb).

        Ragged batches decode in lockstep this way: every row's write
        frontier is the same scalar cache index (KVCache.idx is scalar;
        per-row right-padding would need scatter writes), and the pad slots
        are masked out of every attention read.  GPT-2's positions are
        learned embeddings added by the CALLER on the real token index, so
        the constant left shift changes nothing else."""
        b, lb, _ = embeds.shape
        max_len = caches[0].k.shape[-2]
        i = jnp.arange(lb)[:, None]
        j = jnp.arange(max_len)[None, :]
        causal = (j <= i) & (j < lb)
        valid = j[None] >= pad_len[:, None, None]        # [B, 1, max_len]
        mask = jnp.where(causal[None] & valid, 0.0, -1e9)[:, None]
        x = embeds
        new_caches = []
        for layer, cache in zip(self.h, caches):
            x, cache = layer(x, cache, mask)
            new_caches.append(cache)
        return self.ln_f(x)[:, -1], new_caches

    def step(self, caches: List[KVCache], embed: jax.Array, pad_len=None):
        """One embedding [B, 1, D] at the cache frontier -> (hidden [B, D]
        after ln_f, caches).  pad_len [B] (left-padded batches) masks each
        row's pad slots out of the attention read."""
        pos = caches[0].idx
        max_len = caches[0].k.shape[-2]
        j = jnp.arange(max_len)[None, None, None, :]
        valid = j <= pos
        if pad_len is not None:
            valid = valid & (j >= pad_len[:, None, None, None])
        mask = jnp.where(valid, 0.0, -1e9).astype(jnp.float32)
        x = embed
        new_caches = []
        for layer, cache in zip(self.h, caches):
            x, cache = layer(x, cache, mask)
            new_caches.append(cache)
        return self.ln_f(x)[:, -1], new_caches
