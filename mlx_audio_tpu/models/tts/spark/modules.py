"""Spark-TTS BiCodec building blocks.

Capability parity with /root/reference/mlx_audio/tts/models/spark/modules/
(sampler.py, residual.py, finite_scalar_quantization.py, residual_fsq.py,
speaker/{ecapa_tdnn,pooling_layers,perceiver_encoder}.py), NLC layout on
the shared block library; all gathers vectorized.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.nn import (
    BatchNorm,
    Conv1d,
    Embedding,
    Linear,
    Module,
    WNConv1d,
    WNConvTranspose1d,
    leaky_relu,
)


# ---------------------------------------------------------------------------
# Sampling block (sampler.py:10-96)
# ---------------------------------------------------------------------------


class SamplingBlock(Module):
    def __init__(self, dim: int, groups: int = 1, upsample_scale: int = 1,
                 downsample_scale: int = 1):
        self.upsample_scale = upsample_scale
        self.downsample_scale = downsample_scale
        if upsample_scale > 1:
            self.de_conv_upsampler = WNConvTranspose1d(
                dim, dim, kernel_size=upsample_scale * 2, stride=upsample_scale,
                padding=upsample_scale // 2 + upsample_scale % 2, groups=groups,
            )
        if downsample_scale > 1:
            self.conv_downsampler = Conv1d(
                dim, dim, kernel_size=2 * downsample_scale,
                stride=downsample_scale,
                padding=downsample_scale // 2 + downsample_scale % 2,
                groups=groups,
            )

    @staticmethod
    def repeat_upsampler(x, scale):
        return jnp.repeat(x, scale, axis=1)

    @staticmethod
    def skip_downsampler(x, scale):
        b, t, c = x.shape
        t2 = t - t % scale
        return x[:, :t2].reshape(b, t2 // scale, scale, c).mean(axis=2)

    def __call__(self, x: jax.Array) -> jax.Array:
        """[B, T, C] -> resampled [B, T', C]."""
        if self.upsample_scale > 1:
            repeat_res = self.repeat_upsampler(x, self.upsample_scale)
            deconv_res = self.de_conv_upsampler(leaky_relu(x, 0.2))
            upmerge = repeat_res + deconv_res
        else:
            upmerge = repeat_res = x
        if self.downsample_scale > 1:
            conv_res = self.conv_downsampler(leaky_relu(upmerge, 0.2))
            skip2 = self.skip_downsampler(upmerge, self.downsample_scale)
            skip1 = self.skip_downsampler(repeat_res, self.downsample_scale)
        else:
            conv_res = skip2 = upmerge
            skip1 = repeat_res
        return conv_res + skip1 + skip2


# ---------------------------------------------------------------------------
# Factorized VQ (residual.py:18-209)
# ---------------------------------------------------------------------------


class FactorizedVectorQuantize(Module):
    def __init__(self, input_dim: int, codebook_size: int, codebook_dim: int,
                 **kwargs):
        self.input_dim = input_dim
        self.codebook_size = codebook_size
        self.codebook_dim = codebook_dim
        proj = input_dim != codebook_dim
        self.in_project = (WNConv1d(input_dim, codebook_dim, 1) if proj else None)
        self.out_project = (WNConv1d(codebook_dim, input_dim, 1) if proj else None)
        self.codebook = Embedding(codebook_size, codebook_dim)

    @staticmethod
    def _l2n(x, axis=-1):
        return x / jnp.maximum(
            jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True)), 1e-12
        )

    def _in(self, z):
        return self.in_project(z) if self.in_project is not None else z

    def _out(self, z):
        return self.out_project(z) if self.out_project is not None else z

    def decode_latents(self, z_e):
        """z_e [B, T, D] -> (z_q [B, T, D], indices [B, T])."""
        enc = self._l2n(z_e)
        cb = self._l2n(self.codebook.weight)
        dist = (
            jnp.sum(enc * enc, axis=-1, keepdims=True)
            - 2 * enc @ cb.T
            + jnp.sum(cb * cb, axis=-1)[None, None, :]
        )
        indices = jnp.argmin(dist, axis=-1).astype(jnp.int32)
        return self.codebook(indices), indices

    def tokenize(self, z: jax.Array) -> jax.Array:
        """z [B, T, input_dim] -> indices [B, T]."""
        z_e = self._in(z)
        _, indices = self.decode_latents(z_e)
        return indices

    def detokenize(self, indices: jax.Array) -> jax.Array:
        """indices [B, T] -> z_q [B, T, input_dim]."""
        return self._out(self.codebook(indices))

    def __call__(self, z):
        z_e = self._in(z)
        z_q, indices = self.decode_latents(z_e)
        return {"z_q": self._out(z_q), "indices": indices}


# ---------------------------------------------------------------------------
# FSQ + ResidualFSQ (finite_scalar_quantization.py, residual_fsq.py)
# ---------------------------------------------------------------------------


class FSQ(Module):
    def __init__(self, levels: List[int], dim: Optional[int] = None):
        self.levels = list(levels)
        self._levels = jnp.asarray(levels)
        self._basis = jnp.asarray(
            np.cumprod([1] + list(levels[:-1])), dtype=jnp.int32
        )
        self.codebook_dim = len(levels)
        self.dim = dim or self.codebook_dim
        assert self.dim == self.codebook_dim, "projections unused in Spark configs"
        self.codebook_size = int(np.prod(levels))

    def bound(self, z, eps: float = 1e-3):
        half_l = (self._levels - 1) * (1 + eps) / 2
        offset = jnp.where(self._levels % 2 == 0, 0.5, 0.0)
        shift = jnp.arctanh(offset / half_l)
        return jnp.tanh(z + shift) * half_l - offset

    def quantize(self, z):
        quantized = jnp.round(self.bound(z))
        half_width = self._levels // 2
        return quantized / half_width

    def codes_to_indices(self, zhat):
        half_width = self._levels // 2
        scaled = zhat * half_width + half_width
        return jnp.sum(scaled * self._basis, axis=-1).astype(jnp.int32)

    def indices_to_codes(self, indices):
        half_width = self._levels // 2
        level_idx = (indices[..., None] // self._basis) % self._levels
        return (level_idx - half_width) / half_width

    def __call__(self, z):
        """z [B, T, D] -> (codes [B, T, D], indices [B, T])."""
        codes = self.quantize(z.astype(jnp.float32))
        return codes, self.codes_to_indices(codes)


class ResidualFSQ(Module):
    """Residual FSQ (residual_fsq.py:26-309); Spark uses num_quantizers=1."""

    def __init__(self, *, levels: List[int], num_quantizers: int,
                 dim: Optional[int] = None, is_channel_first: bool = False,
                 **kwargs):
        codebook_dim = len(levels)
        dim = dim or codebook_dim
        self.has_projections = dim != codebook_dim
        self.project_in = Linear(dim, codebook_dim) if self.has_projections else None
        self.project_out = Linear(codebook_dim, dim) if self.has_projections else None
        self.is_channel_first = is_channel_first
        self.num_quantizers = num_quantizers
        self.layers = [FSQ(levels=levels) for _ in range(num_quantizers)]
        levels_np = np.asarray(levels, dtype=np.float64)
        self.scales = jnp.asarray(
            np.stack([(levels_np - 1) ** -i for i in range(num_quantizers)])
        )
        self.codebook_size = self.layers[0].codebook_size

    def _maybe_cf(self, x, to_last):
        if self.is_channel_first:
            return jnp.swapaxes(x, 1, 2)
        return x

    def __call__(self, x):
        """x: [B, D, T] if channel-first else [B, T, D] ->
        (quantized (same layout), indices [B, T, Q])."""
        x = self._maybe_cf(x, True)
        if self.project_in is not None:
            x = self.project_in(x)
        quantized_out = 0.0
        residual = x
        indices = []
        for i, layer in enumerate(self.layers):
            scale = self.scales[i]
            q, idx = layer(residual / scale)
            q = q * scale
            residual = residual - q
            quantized_out = quantized_out + q
            indices.append(idx)
        if self.project_out is not None:
            quantized_out = self.project_out(quantized_out)
        out = self._maybe_cf(quantized_out, False)
        return out, jnp.stack(indices, axis=-1)

    def get_codes_from_indices(self, indices):
        """indices [B, T, Q] -> codes summed [B, T, D]."""
        if indices.ndim == 2:
            indices = indices[..., None]
        out = 0.0
        for i, layer in enumerate(self.layers):
            codes = layer.indices_to_codes(indices[..., i])
            out = out + codes * self.scales[i]
        return out

    def get_output_from_indices(self, indices):
        out = self.get_codes_from_indices(indices)
        if self.project_out is not None:
            out = self.project_out(out)
        return out


# ---------------------------------------------------------------------------
# Perceiver resampler (perceiver_encoder.py:124-326)
# ---------------------------------------------------------------------------


class RMSNormL(Module):
    """lucidrains-style RMSNorm: unit-normalize then scale by sqrt(dim)*g."""

    def __init__(self, dim: int):
        self.scale = dim ** 0.5
        self.gamma = jnp.ones((dim,))

    def __call__(self, x):
        n = x / jnp.maximum(
            jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True)), 1e-12
        )
        return n * self.scale * self.gamma


class GEGLUFeedForward(Module):
    def __init__(self, dim: int, mult: int = 4):
        inner = int(dim * mult * 2 / 3)
        self.w_in = Linear(dim, inner * 2)
        self.w_out = Linear(inner, dim)

    def __call__(self, x):
        h, gate = jnp.split(self.w_in(x), 2, axis=-1)
        return self.w_out(jax.nn.gelu(gate, approximate=False) * h)


class PerceiverAttention(Module):
    def __init__(self, dim: int, dim_context: Optional[int] = None,
                 dim_head: int = 64, heads: int = 8,
                 cross_attn_include_queries: bool = False):
        self.heads = heads
        self.dim_head = dim_head
        self.include_queries = cross_attn_include_queries
        inner = dim_head * heads
        dim_context = dim_context or dim
        self.to_q = Linear(dim, inner, bias=False)
        self.to_kv = Linear(dim_context, inner * 2, bias=False)
        self.to_out = Linear(inner, dim, bias=False)

    def __call__(self, x, context=None):
        ctx = context if context is not None else x
        if context is not None and self.include_queries:
            ctx = jnp.concatenate([x, ctx], axis=-2)
        b, n, _ = x.shape
        q = self.to_q(x).reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        kv = self.to_kv(ctx)
        k, v = jnp.split(kv, 2, axis=-1)
        m = ctx.shape[1]
        k = k.reshape(b, m, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        v = v.reshape(b, m, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        scale = self.dim_head ** -0.5
        scores = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32) * scale
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, -1)
        return self.to_out(out)


class PerceiverResampler(Module):
    def __init__(self, *, dim: int, depth: int = 2,
                 dim_context: Optional[int] = None, num_latents: int = 32,
                 dim_head: int = 64, heads: int = 8, ff_mult: int = 4):
        dim_context = dim_context or dim
        self.proj_context = Linear(dim_context, dim) if dim_context != dim else None
        self.latents = jnp.asarray(
            np.random.default_rng(0).normal(scale=0.02, size=(num_latents, dim)),
            dtype=jnp.float32,
        )
        self.layers = [
            [PerceiverAttention(dim=dim, dim_head=dim_head, heads=heads,
                                cross_attn_include_queries=True),
             GEGLUFeedForward(dim, ff_mult)]
            for _ in range(depth)
        ]
        self.norm = RMSNormL(dim)

    def __call__(self, x):
        """context x [B, T, D_ctx] -> latents [B, num_latents, dim]."""
        if self.proj_context is not None:
            x = self.proj_context(x)
        b = x.shape[0]
        latents = jnp.broadcast_to(self.latents[None], (b, *self.latents.shape))
        for attn, ff in self.layers:
            latents = attn(latents, x) + latents
            latents = ff(latents) + latents
        return self.norm(latents)


# ---------------------------------------------------------------------------
# ECAPA-TDNN speaker encoder (ecapa_tdnn.py, pooling_layers.py ASTP)
# ---------------------------------------------------------------------------


class Conv1dReluBn(Module):
    def __init__(self, in_channels, out_channels, kernel_size=1, stride=1,
                 padding=0, dilation=1):
        self.conv = Conv1d(in_channels, out_channels, kernel_size, stride,
                           padding, dilation)
        self.bn = BatchNorm(out_channels)

    def __call__(self, x):
        return self.bn(jax.nn.relu(self.conv(x)))


class Res2Conv1dReluBn(Module):
    def __init__(self, channels, kernel_size=1, stride=1, padding=0,
                 dilation=1, scale=4):
        self.scale = scale
        self.width = channels // scale
        self.nums = scale if scale == 1 else scale - 1
        self.convs = [
            Conv1d(self.width, self.width, kernel_size, stride, padding, dilation)
            for _ in range(self.nums)
        ]
        self.bns = [BatchNorm(self.width) for _ in range(self.nums)]

    def __call__(self, x):
        """[B, T, C]."""
        spx = jnp.split(x, self.scale, axis=-1)
        out = []
        sp = spx[0]
        for i, (conv, bn) in enumerate(zip(self.convs, self.bns)):
            if i >= 1:
                sp = sp + spx[i]
            sp = bn(jax.nn.relu(conv(sp)))
            out.append(sp)
        if self.scale != 1:
            out.append(spx[self.nums])
        return jnp.concatenate(out, axis=-1)


class SEConnect(Module):
    def __init__(self, channels, se_bottleneck_dim=128):
        self.linear1 = Linear(channels, se_bottleneck_dim)
        self.linear2 = Linear(se_bottleneck_dim, channels)

    def __call__(self, x):
        s = jnp.mean(x, axis=1)
        s = jax.nn.sigmoid(self.linear2(jax.nn.relu(self.linear1(s))))
        return x * s[:, None, :]


class SERes2Block(Module):
    def __init__(self, channels, kernel_size, stride, padding, dilation, scale):
        self.block = [
            Conv1dReluBn(channels, channels, 1, 1, 0),
            Res2Conv1dReluBn(channels, kernel_size, stride, padding, dilation,
                             scale=scale),
            Conv1dReluBn(channels, channels, 1, 1, 0),
            SEConnect(channels),
        ]

    def __call__(self, x):
        res = x
        for m in self.block:
            x = m(x)
        return x + res


class ASTP(Module):
    """Attentive statistics pooling (pooling_layers.py ASTP)."""

    def __init__(self, in_dim, bottleneck_dim=128, global_context_att=False):
        self.in_dim = in_dim
        self.global_context_att = global_context_att
        in1 = in_dim * 3 if global_context_att else in_dim
        self.linear1 = Conv1d(in1, bottleneck_dim, 1)
        self.linear2 = Conv1d(bottleneck_dim, in_dim, 1)

    def __call__(self, x):
        """[B, T, C] -> [B, 2C]."""
        if self.global_context_att:
            mean = jnp.broadcast_to(jnp.mean(x, axis=1, keepdims=True), x.shape)
            std = jnp.broadcast_to(
                jnp.sqrt(jnp.var(x, axis=1, keepdims=True) + 1e-7), x.shape
            )
            x_in = jnp.concatenate([x, mean, std], axis=-1)
        else:
            x_in = x
        alpha = jnp.tanh(self.linear1(x_in))
        alpha = jax.nn.softmax(self.linear2(alpha), axis=1)
        mean = jnp.sum(alpha * x, axis=1)
        var = jnp.sum(alpha * x * x, axis=1) - mean ** 2
        std = jnp.sqrt(jnp.clip(var, 1e-7, None))
        return jnp.concatenate([mean, std], axis=-1)


class ECAPA_TDNN(Module):
    def __init__(self, channels=512, feat_dim=80, embed_dim=192,
                 global_context_att=False):
        self.layer1 = Conv1dReluBn(feat_dim, channels, kernel_size=5, padding=2)
        self.layer2 = SERes2Block(channels, 3, 1, 2, 2, scale=8)
        self.layer3 = SERes2Block(channels, 3, 1, 3, 3, scale=8)
        self.layer4 = SERes2Block(channels, 3, 1, 4, 4, scale=8)
        out_channels = 512 * 3
        self.conv = Conv1d(channels * 3, out_channels, 1)
        self.pool = ASTP(out_channels, global_context_att=global_context_att)
        self.bn = BatchNorm(out_channels * 2)
        self.linear = Linear(out_channels * 2, embed_dim)

    def __call__(self, x, return_latent: bool = False):
        """mel [B, T, F] -> embedding [B, embed_dim] (+ latent [B, T, 1536])."""
        out1 = self.layer1(x)
        out2 = self.layer2(out1)
        out3 = self.layer3(out2)
        out4 = self.layer4(out3)
        out = jnp.concatenate([out2, out3, out4], axis=-1)
        latent = jax.nn.relu(self.conv(out))
        out = self.linear(self.bn(self.pool(latent)))
        if return_latent:
            return out, latent
        return out


class SpeakerEncoder(Module):
    """x-vector + FSQ-tokenized d-vector (speaker_encoder.py:36-155)."""

    def __init__(self, input_dim: int = 100, out_dim: int = 512,
                 latent_dim: int = 128, token_num: int = 32,
                 fsq_levels: List[int] = (4, 4, 4, 4, 4, 4),
                 fsq_num_quantizers: int = 1):
        self.speaker_encoder = ECAPA_TDNN(
            channels=512, feat_dim=input_dim, embed_dim=out_dim,
            global_context_att=True,
        )
        self.perceiver_sampler = PerceiverResampler(
            dim=latent_dim, dim_context=512 * 3, num_latents=token_num
        )
        self.quantizer = ResidualFSQ(
            dim=latent_dim, num_quantizers=fsq_num_quantizers,
            levels=list(fsq_levels), is_channel_first=False,
        )
        self.project = Linear(latent_dim * token_num, out_dim)

    def __call__(self, mels: jax.Array):
        """mels [B, T, F] -> (x_vector [B, out], d_vector [B, out])."""
        x_vector, features = self.speaker_encoder(mels, return_latent=True)
        latents = self.perceiver_sampler(features)  # [B, tokens, latent]
        z_q, indices = self.quantizer(latents)
        d_vector = self.project(z_q.reshape(z_q.shape[0], -1))
        return x_vector, d_vector

    def tokenize(self, mels: jax.Array) -> jax.Array:
        _, features = self.speaker_encoder(mels, return_latent=True)
        latents = self.perceiver_sampler(features)
        _, indices = self.quantizer(latents)
        return indices[..., 0]  # single quantizer

    def detokenize(self, indices: jax.Array) -> jax.Array:
        """indices [B, tokens] -> d_vector [B, out]."""
        zq = self.quantizer.get_output_from_indices(indices)
        return self.project(zq.reshape(zq.shape[0], -1))
