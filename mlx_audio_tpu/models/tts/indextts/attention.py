"""IndexTTS attention primitives.

Capability parity with /root/reference/mlx_audio/tts/models/indextts/
attention.py:8-181.  TPU notes: positional tables are precomputed numpy
constants (static shapes); the rel-position bias lands in the SDPA mask
slot so XLA fuses it into the attention softmax.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.nn import Embedding, Linear, Module


def _sdpa(q, k, v, scale, mask=None):
    """[B, H, T, D] attention with f32 softmax."""
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    if mask is not None:
        scores = scores + mask.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


class MultiHeadAttention(Module):
    """Plain MHA with optional distinct head_dim (attention.py:8-51)."""

    def __init__(self, n_head: int, n_feat: int, bias: bool = True,
                 head_dim: Optional[int] = None):
        self.n_head = n_head
        self.head_dim = n_feat // n_head if not head_dim else head_dim
        self.scale = self.head_dim ** -0.5
        inner = self.head_dim * n_head
        self.linear_q = Linear(n_feat, inner, bias=bias)
        self.linear_k = Linear(n_feat, inner, bias=bias)
        self.linear_v = Linear(n_feat, inner, bias=bias)
        self.linear_out = Linear(inner, n_feat, bias=bias)

    def _split(self, x, b, t):
        return x.reshape(b, t, self.n_head, self.head_dim).transpose(0, 2, 1, 3)

    def __call__(self, q, k, v, pos_emb=None, mask=None):
        b, tq, _ = q.shape
        tk = k.shape[1]
        qh = self._split(self.linear_q(q), b, tq)
        kh = self._split(self.linear_k(k), b, tk)
        vh = self._split(self.linear_v(v), b, tk)
        o = _sdpa(qh, kh, vh, self.scale, mask)
        return self.linear_out(o.transpose(0, 2, 1, 3).reshape(b, tq, -1))


class RelPositionMultiHeadAttention(MultiHeadAttention):
    """Transformer-XL-style attention with position-projection bias
    (attention.py:54-124): matrix_bd = (q + pos_bias_v) @ linear_pos(pe)^T
    is added to the (q + pos_bias_u) @ k^T scores inside the softmax."""

    def __init__(self, n_head: int, n_feat: int, bias: bool = True,
                 head_dim: Optional[int] = None):
        super().__init__(n_head=n_head, n_feat=n_feat, bias=bias,
                         head_dim=head_dim)
        self.linear_pos = Linear(n_feat, n_feat, bias=False)
        self.pos_bias_u = jnp.zeros((self.n_head, self.head_dim))
        self.pos_bias_v = jnp.zeros((self.n_head, self.head_dim))

    def __call__(self, q, k, v, pos_emb=None, mask=None):
        if pos_emb is None:
            raise ValueError("pos_emb is necessary!")
        b, tq, _ = q.shape
        tk = k.shape[1]
        qh = self.linear_q(q).reshape(b, tq, self.n_head, self.head_dim)
        q_u = (qh + self.pos_bias_u).transpose(0, 2, 1, 3)
        q_v = (qh + self.pos_bias_v).transpose(0, 2, 1, 3)
        kh = self._split(self.linear_k(k), b, tk)
        vh = self._split(self.linear_v(v), b, tk)
        p = self.linear_pos(pos_emb)
        p = p.reshape(p.shape[0], p.shape[1], self.n_head, self.head_dim)
        p = p.transpose(0, 2, 1, 3)
        matrix_bd = jnp.einsum("bhqd,bhkd->bhqk", q_v, p) * self.scale
        if mask is not None:
            matrix_bd = jnp.where(mask, -1e9, matrix_bd)
        o = _sdpa(q_u, kh, vh, self.scale, mask=matrix_bd)
        return self.linear_out(o.transpose(0, 2, 1, 3).reshape(b, tq, -1))


class RelPositionalEncoding(Module):
    """Absolute sin/cos table served per offset (attention.py:127-170)."""

    def __init__(self, d_model: int, max_len: int = 5000,
                 scale_input: bool = True):
        assert d_model % 2 == 0 and max_len > 0
        self.d_model = d_model
        self.max_len = max_len
        self.xscale = math.sqrt(d_model) if scale_input else 1.0
        self.pe = jnp.asarray(self._table(max_len))

    def _table(self, max_len: int) -> np.ndarray:
        positions = np.arange(max_len, dtype=np.float64)[:, None]
        div = np.exp(np.arange(0, self.d_model, 2, dtype=np.float64)
                     * -(math.log(10000.0) / self.d_model))
        pe = np.zeros((max_len, self.d_model), dtype=np.float32)
        pe[:, 0::2] = np.sin(positions * div)
        pe[:, 1::2] = np.cos(positions * div)
        return pe[None]

    def __call__(self, x: jax.Array, offset: int = 0):
        t = x.shape[1]
        pe = self.pe
        if t + offset > pe.shape[1]:
            # grow the table on demand (reference attention.py:160-164);
            # host-side only — conditioning runs unjitted, shapes static.
            pe = jnp.asarray(self._table(t + offset))
            self.pe = pe
        return x * self.xscale, pe[:, offset:offset + t].astype(x.dtype)


class LearnedPositionEncoding(Module):
    """Embedding-table positions (attention.py:173-181)."""

    def __init__(self, seq_len: int, model_dim: int):
        self.emb = Embedding(seq_len, model_dim)

    def __call__(self, x: jax.Array, offset=0) -> jax.Array:
        positions = offset + jnp.arange(x.shape[1])
        return self.emb(positions)
