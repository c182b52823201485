"""IndexTTS perceiver resampler.

Capability parity with /root/reference/mlx_audio/tts/models/indextts/
perceiver.py:10-62.  Differs from Spark's resampler: latents init to
zeros, K/V = concat(context, latents), gated-GELU feed-forward, and a
standard (gamma-only) RMSNorm.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mlx_audio_tpu.nn import Linear, Module, RMSNorm

from .attention import MultiHeadAttention


class GatedGELUFeedForward(Module):
    def __init__(self, dim: int, d_ff: int, use_bias: bool = True):
        self.w_1 = Linear(dim, d_ff * 2, bias=use_bias)
        self.w_2 = Linear(d_ff, dim, bias=use_bias)

    def __call__(self, x):
        h, gate = jnp.split(self.w_1(x), 2, axis=-1)
        return self.w_2(jax.nn.gelu(gate, approximate=False) * h)


class PerceiverResampler(Module):
    def __init__(self, n_dim: int, n_depth: int = 2,
                 n_dim_context: Optional[int] = None, n_latents: int = 32,
                 n_dim_head: int = 64, n_heads: int = 8, n_ff_mult: int = 4):
        n_dim_context = n_dim if n_dim_context is None else n_dim_context
        self.proj_context = (
            Linear(n_dim_context, n_dim) if n_dim_context != n_dim else None
        )
        self.latents = jnp.zeros((n_latents, n_dim))
        self.layers = [
            [MultiHeadAttention(n_heads, n_dim, False, n_dim_head),
             GatedGELUFeedForward(n_dim, (n_dim * n_ff_mult * 2) // 3)]
            for _ in range(n_depth)
        ]
        self.norm = RMSNorm(n_dim)

    def __call__(self, x: jax.Array) -> jax.Array:
        """context [B, T, n_dim_context] -> latents [B, n_latents, n_dim]."""
        b = x.shape[0]
        if self.proj_context is not None:
            x = self.proj_context(x)
        latents = jnp.broadcast_to(self.latents[None], (b, *self.latents.shape))
        for attn, ff in self.layers:
            kv = jnp.concatenate([x, latents], axis=-2)
            latents = latents + attn(latents, kv, kv)
            latents = latents + ff(latents)
        return self.norm(latents)
