"""Residual vector quantization (Mimi's split RVQ).

Capability parity with /root/reference/mlx_audio/codec/models/mimi/modules/
quantization.py:13-182.  The codebook keeps the checkpoint's raw
``embedding_sum`` / ``cluster_usage`` stats and derives the embedding
in-graph (XLA constant-folds it), so weights load without a post-load
"update_in_place" pass.  Encode is one [N, D] @ [D, bins] matmul + argmin —
MXU-friendly at any batch size.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mlx_audio_tpu.nn.module import Module
from mlx_audio_tpu.nn.layers import Linear, _uniform


class EuclideanCodebook(Module):
    def __init__(self, dim: int, codebook_size: int):
        self.epsilon = 1e-5
        self.dim = dim
        self.initialized = jnp.zeros((1,))
        self.embedding_sum = _uniform((codebook_size, dim), 1.0)
        self.cluster_usage = jnp.ones((codebook_size,))

    @property
    def embedding(self) -> jax.Array:
        usage = jnp.maximum(self.cluster_usage, self.epsilon)[:, None]
        return self.embedding_sum / usage

    def encode(self, x: jax.Array) -> jax.Array:
        """[..., D] -> int32 codes [...]."""
        emb = self.embedding
        c2 = jnp.sum(emb * emb, axis=-1) / 2
        dot = x @ emb.T
        return jnp.argmin(c2 - dot, axis=-1).astype(jnp.int32)

    def decode(self, codes: jax.Array) -> jax.Array:
        """int codes [...] -> [..., D]."""
        return jnp.take(self.embedding, codes, axis=0)


class VectorQuantization(Module):
    def __init__(self, dim: int, codebook_size: int, codebook_dim: Optional[int] = None):
        codebook_dim = dim if codebook_dim is None else codebook_dim
        if dim == codebook_dim:
            self.project_in = None
            self.project_out = None
        else:
            self.project_in = Linear(dim, codebook_dim)
            self.project_out = Linear(codebook_dim, dim)
        self.codebook = EuclideanCodebook(dim=codebook_dim, codebook_size=codebook_size)

    def encode(self, x: jax.Array) -> jax.Array:
        """[B, T, D] -> codes [B, T]."""
        if self.project_in is not None:
            x = self.project_in(x)
        return self.codebook.encode(x)

    def decode(self, codes: jax.Array) -> jax.Array:
        x = self.codebook.decode(codes)
        if self.project_out is not None:
            x = self.project_out(x)
        return x


class ResidualVectorQuantization(Module):
    def __init__(self, nq: int, dim: int, codebook_size: int,
                 codebook_dim: Optional[int] = None):
        self.layers = [
            VectorQuantization(dim, codebook_size, codebook_dim) for _ in range(nq)
        ]

    def encode(self, x: jax.Array) -> jax.Array:
        """[B, T, D] -> codes [B, nq, T]."""
        codes = []
        residual = x
        for layer in self.layers:
            idx = layer.encode(residual)
            residual = residual - layer.decode(idx)
            codes.append(idx)
        return jnp.stack(codes, axis=1)

    def decode(self, codes: jax.Array) -> jax.Array:
        """codes [B, nq, T] -> [B, T, D]."""
        out = self.layers[0].decode(codes[:, 0])
        for i in range(1, len(self.layers)):
            out = out + self.layers[i].decode(codes[:, i])
        return out


class ResidualVectorQuantizer(Module):
    def __init__(self, dim: int, input_dim: Optional[int], output_dim: Optional[int],
                 nq: int, bins: int, force_projection: bool = False):
        input_dim = dim if input_dim is None else input_dim
        output_dim = dim if output_dim is None else output_dim
        # 1x1 convs in the reference == linear projections in NLC
        self.input_proj = (
            Linear(input_dim, dim, bias=False)
            if (input_dim != dim or force_projection) else None
        )
        self.output_proj = (
            Linear(dim, output_dim, bias=False)
            if (output_dim != dim or force_projection) else None
        )
        self.vq = ResidualVectorQuantization(nq=nq, dim=dim, codebook_size=bins)

    def encode(self, x: jax.Array) -> jax.Array:
        """[B, T, D_in] -> codes [B, nq, T]."""
        if self.input_proj is not None:
            x = self.input_proj(x)
        return self.vq.encode(x)

    def decode(self, codes: jax.Array) -> jax.Array:
        out = self.vq.decode(codes)
        if self.output_proj is not None:
            out = self.output_proj(out)
        return out


class SplitResidualVectorQuantizer(Module):
    """Semantic (first) + acoustic (rest) codebook split (reference
    quantization.py:143-182)."""

    def __init__(self, dim: int, input_dim: Optional[int], output_dim: Optional[int],
                 nq: int, bins: int):
        self.nq = nq
        self.rvq_first = ResidualVectorQuantizer(
            dim, input_dim, output_dim, nq=1, bins=bins, force_projection=True
        )
        self.rvq_rest = ResidualVectorQuantizer(
            dim, input_dim, output_dim, nq=nq - 1, bins=bins, force_projection=True
        )

    def encode(self, x: jax.Array) -> jax.Array:
        codes = self.rvq_first.encode(x)
        if self.nq > 1:
            codes = jnp.concatenate([codes, self.rvq_rest.encode(x)], axis=1)
        return codes

    def decode(self, codes: jax.Array) -> jax.Array:
        out = self.rvq_first.decode(codes[:, :1])
        if self.nq > 1:
            out = out + self.rvq_rest.decode(codes[:, 1:])
        return out
