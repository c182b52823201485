"""Mimi's 8-layer streaming transformer (encoder- and decoder-side).

Capability parity with /root/reference/mlx_audio/codec/models/mimi/modules/
transformer.py:15-256, TPU-first:

* Batch path applies the proper windowed-causal mask (context=250).  NB the
  reference's MLX batch path passes ``mask=None`` (transformer.py:100,240),
  silently running full bidirectional attention; we keep the original Mimi
  semantics so batch and streaming paths agree.
* Streaming path carries a functional rotating KV cache (fixed window
  buffers + absolute offset) — the XLA replacement for RotatingKVCache
  (kv_cache.py:64-199).
* RoPE is the "traditional" interleaved-pair rotation (MLX nn.RoPE
  traditional=True, transformer.py:74).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.nn.module import Module
from mlx_audio_tpu.nn.layers import LayerNorm, Linear, RMSNorm


@dataclass
class TransformerConfig:
    d_model: int
    num_heads: int
    num_layers: int
    causal: bool
    norm_first: bool
    bias_ff: bool
    bias_attn: bool
    layer_scale: Optional[float]
    positional_embedding: str
    use_conv_bias: bool
    gating: bool
    norm: str
    context: int
    max_period: int
    max_seq_len: int
    kv_repeat: int
    dim_feedforward: int
    conv_layout: bool
    use_conv_block: bool = False
    cross_attention: bool = False
    conv_kernel_size: int = 3

    @property
    def head_dim(self) -> int:
        return self.d_model // self.num_heads


def rope_traditional(x: jax.Array, positions: jax.Array, max_period: float) -> jax.Array:
    """Interleaved-pair rotary embedding: pairs are (x[..., 2i], x[..., 2i+1]).

    x: [B, H, L, D]; positions: [L] absolute positions.
    """
    d = x.shape[-1]
    inv_freq = 1.0 / (max_period ** (jnp.arange(0, d, 2) / d))
    freqs = positions[:, None].astype(jnp.float32) * inv_freq[None, :]  # [L, D/2]
    cos = jnp.cos(freqs)[None, None]
    sin = jnp.sin(freqs)[None, None]
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    y1 = x1 * cos - x2 * sin
    y2 = x2 * cos + x1 * sin
    out = jnp.stack([y1, y2], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)


class RotCacheState(NamedTuple):
    """Functional rotating KV cache: fixed [B, H, W, D] ring buffers plus the
    absolute write offset."""

    k: jax.Array
    v: jax.Array
    offset: jax.Array  # int32 scalar — total tokens written so far


class Attention(Module):
    """Packed-QKV attention (reference transformer.py:62-103)."""

    def __init__(self, cfg: TransformerConfig):
        assert cfg.kv_repeat == 1, "only kv_repeat==1 supported (as reference)"
        self.num_heads = cfg.num_heads
        self.head_dim = cfg.head_dim
        self.context = cfg.context
        self.max_period = cfg.max_period
        self.use_rope = cfg.positional_embedding == "rope"
        out_dim = cfg.d_model + 2 * cfg.d_model
        self.in_proj = Linear(cfg.d_model, out_dim, bias=cfg.bias_attn)
        self.out_proj = Linear(cfg.d_model, cfg.d_model, bias=cfg.bias_attn)

    def _qkv(self, x: jax.Array):
        b, t, _ = x.shape
        qkv = self.in_proj(x).reshape(b, t, 3, self.num_heads, self.head_dim)
        q = qkv[:, :, 0].transpose(0, 2, 1, 3)
        k = qkv[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv[:, :, 2].transpose(0, 2, 1, 3)
        return q, k, v

    def __call__(self, x: jax.Array) -> jax.Array:
        """Batch path: windowed causal self-attention over [B, T, D]."""
        b, t, _ = x.shape
        q, k, v = self._qkv(x)
        if self.use_rope:
            pos = jnp.arange(t)
            q = rope_traditional(q, pos, self.max_period)
            k = rope_traditional(k, pos, self.max_period)
        scale = self.head_dim ** -0.5
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
        i = jnp.arange(t)[:, None]
        j = jnp.arange(t)[None, :]
        allowed = (j <= i) & (i - j < self.context)
        scores = jnp.where(allowed[None, None], scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, -1)
        return self.out_proj(out)

    # -- streaming ---------------------------------------------------------

    def init_cache(self, batch: int, dtype=jnp.float32) -> RotCacheState:
        return RotCacheState(
            k=jnp.zeros((batch, self.num_heads, self.context, self.head_dim), dtype),
            v=jnp.zeros((batch, self.num_heads, self.context, self.head_dim), dtype),
            offset=jnp.zeros((), jnp.int32),
        )

    def step(self, cache: RotCacheState, x: jax.Array) -> tuple[jax.Array, RotCacheState]:
        """One streaming step of t tokens (t <= context), x: [B, t, D]."""
        b, t, _ = x.shape
        q, k, v = self._qkv(x)
        positions = cache.offset + jnp.arange(t)
        if self.use_rope:
            q = rope_traditional(q, positions, self.max_period)
            k = rope_traditional(k, positions, self.max_period)
        w = self.context
        slots_new = positions % w
        total = cache.offset + t

        # Attend over the PRE-write ring buffer plus this step's keys:
        # scattering all t tokens before attending would let token j+1's
        # write evict a slot still inside token j's window (a full ring +
        # multi-token step silently shrank early queries' windows by one —
        # batch/streaming equivalence broke past `w` streamed positions).
        s = jnp.arange(w)
        # slot s holds the largest position p <= offset-1 with p ≡ s (mod w)
        p_old = (cache.offset - 1) - ((cache.offset - 1 - s) % w)
        qp = positions[:, None]  # [t, 1]
        valid_old = (p_old[None, :] >= 0) & (p_old[None, :] <= qp) \
            & (p_old[None, :] > qp - w)
        # in-step keys: causal (i <= j); always within the window since t<=w
        i = jnp.arange(t)[None, :]
        valid_new = i <= jnp.arange(t)[:, None]
        valid = jnp.concatenate([valid_old, valid_new], axis=1)  # [t, w+t]

        k_all = jnp.concatenate([cache.k, k], axis=2)
        v_all = jnp.concatenate([cache.v, v], axis=2)
        scale = self.head_dim ** -0.5
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k_all).astype(jnp.float32) * scale
        scores = jnp.where(valid[None, None], scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v_all)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, -1)

        # ring-buffer scatter write of the t new tokens
        k_buf = cache.k.at[:, :, slots_new, :].set(k)
        v_buf = cache.v.at[:, :, slots_new, :].set(v)
        new_cache = RotCacheState(k=k_buf, v=v_buf, offset=total)
        return self.out_proj(out), new_cache


class LayerScale(Module):
    def __init__(self, dim: int, init: float = 1.0):
        self.scale = jnp.full((dim,), init)

    def __call__(self, x):
        return x * self.scale


class MlpNoGating(Module):
    def __init__(self, cfg: TransformerConfig):
        self.linear1 = Linear(cfg.d_model, cfg.dim_feedforward, bias=cfg.bias_ff)
        self.linear2 = Linear(cfg.dim_feedforward, cfg.d_model, bias=cfg.bias_ff)

    def __call__(self, x):
        # gelu_approx (tanh) as the reference (transformer.py:132)
        return self.linear2(jax.nn.gelu(self.linear1(x), approximate=True))


class MlpGating(Module):
    def __init__(self, cfg: TransformerConfig):
        hidden = 2 * cfg.dim_feedforward // 3
        if cfg.dim_feedforward == 4 * cfg.d_model:
            hidden = 11 * cfg.d_model // 4
        self.linear_in = Linear(cfg.d_model, 2 * hidden, bias=cfg.bias_ff)
        self.linear_out = Linear(hidden, cfg.d_model, bias=cfg.bias_ff)

    def __call__(self, x):
        b, t, _ = x.shape
        h = self.linear_in(x).reshape(b, t, 2, -1)
        return self.linear_out(jax.nn.silu(h[:, :, 0]) * h[:, :, 1])


class TransformerLayer(Module):
    def __init__(self, cfg: TransformerConfig):
        self.gating = MlpGating(cfg) if cfg.gating else MlpNoGating(cfg)
        norm_cls = LayerNorm if cfg.norm == "layer_norm" else RMSNorm
        eps = 1e-5 if cfg.norm == "layer_norm" else 1e-8
        self.norm1 = norm_cls(cfg.d_model, eps)
        self.norm2 = norm_cls(cfg.d_model, eps)
        if cfg.layer_scale is not None:
            self.layer_scale_1 = LayerScale(cfg.d_model, cfg.layer_scale)
            self.layer_scale_2 = LayerScale(cfg.d_model, cfg.layer_scale)
        else:
            self.layer_scale_1 = None
            self.layer_scale_2 = None
        self.self_attn = Attention(cfg)

    def _ls1(self, x):
        return self.layer_scale_1(x) if self.layer_scale_1 is not None else x

    def _ls2(self, x):
        return self.layer_scale_2(x) if self.layer_scale_2 is not None else x

    def __call__(self, x: jax.Array) -> jax.Array:
        x = x + self._ls1(self.self_attn(self.norm1(x)))
        x = x + self._ls2(self.gating(self.norm2(x)))
        return x

    def step(self, cache: RotCacheState, x: jax.Array):
        attn, cache = self.self_attn.step(cache, self.norm1(x))
        x = x + self._ls1(attn)
        x = x + self._ls2(self.gating(self.norm2(x)))
        return x, cache


class ProjectedTransformer(Module):
    """Input/output-projected transformer stack (reference
    transformer.py:211-256).  Layout here is NLC end to end, so the
    reference's conv_layout swaps vanish."""

    def __init__(self, cfg: TransformerConfig, input_dim: int, output_dims: list):
        self.layers = [TransformerLayer(cfg) for _ in range(cfg.num_layers)]
        self.input_proj = (
            Linear(input_dim, cfg.d_model, bias=False)
            if input_dim != cfg.d_model else None
        )
        self.output_projs = [
            Linear(cfg.d_model, od, bias=False) if od != cfg.d_model else None
            for od in output_dims
        ]

    def __call__(self, x: jax.Array) -> list:
        if self.input_proj is not None:
            x = self.input_proj(x)
        for layer in self.layers:
            x = layer(x)
        return [x if p is None else p(x) for p in self.output_projs]

    def init_cache(self, batch: int, dtype=jnp.float32) -> list:
        return [l.self_attn.init_cache(batch, dtype) for l in self.layers]

    def step(self, caches: list, x: jax.Array):
        if self.input_proj is not None:
            x = self.input_proj(x)
        new_caches = []
        for layer, c in zip(self.layers, caches):
            x, c = layer.step(c, x)
            new_caches.append(c)
        outs = [x if p is None else p(x) for p in self.output_projs]
        return outs, new_caches
