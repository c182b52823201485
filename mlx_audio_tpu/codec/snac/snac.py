"""SNAC — multi-scale neural audio codec (Orpheus's token space).

Capability parity with /root/reference/mlx_audio/codec/models/snac/
(snac.py:15-146, layers.py, vq.py, attention.py): hierarchical RVQ at
per-codebook temporal strides, optional depthwise convs, optional windowed
local attention.  NLC layout on shared blocks; the local attention uses
GPT-NeoX-style rotary (the reference's rotate_half carries an upstream
shape bug; we implement the intended semantics).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.models.base import BaseModelArgs
from mlx_audio_tpu.nn import (
    Embedding,
    LayerNorm,
    Linear,
    Module,
    WNConv1d,
    WNConvTranspose1d,
    conv1d,
    snake,
)
from mlx_audio_tpu.codec.dac.dac import ResidualUnit, Snake1d, _l2_normalize


@dataclass
class SNACConfig(BaseModelArgs):
    sampling_rate: int = 44100
    encoder_dim: int = 64
    encoder_rates: List[int] = field(default_factory=lambda: [3, 3, 7, 7])
    latent_dim: Optional[int] = None
    decoder_dim: int = 1536
    decoder_rates: List[int] = field(default_factory=lambda: [7, 7, 3, 3])
    attn_window_size: Optional[int] = 32
    codebook_size: int = 4096
    codebook_dim: int = 8
    vq_strides: List[int] = field(default_factory=lambda: [8, 4, 2, 1])
    noise: bool = True
    depthwise: bool = True


class LocalMHA(Module):
    """Windowed self-attention with rotary positions (reference
    attention.py:6-45)."""

    def __init__(self, dim: int = 1024, window_size: int = 32,
                 dim_head: int = 64):
        self.norm = LayerNorm(dim)
        self.heads = dim // dim_head
        self.dim_head = dim_head
        self.window_size = window_size
        self.to_qkv = Linear(dim, dim * 3, bias=False)
        self.to_out = Linear(dim, dim, bias=False)

    def _rotary(self, x):
        # GPT-NeoX half-split rotation over the window positions
        n, d = x.shape[-2], x.shape[-1]
        inv_freq = 1.0 / (10000 ** (np.arange(0, d, 2) / d))
        t = np.arange(n)
        freqs = np.concatenate([np.outer(t, inv_freq)] * 2, axis=-1)
        cos = jnp.asarray(np.cos(freqs), dtype=x.dtype)
        sin = jnp.asarray(np.sin(freqs), dtype=x.dtype)
        x1, x2 = jnp.split(x, 2, axis=-1)
        rotated = jnp.concatenate([-x2, x1], axis=-1)
        return x * cos + rotated * sin

    def __call__(self, x: jax.Array) -> jax.Array:
        """[B, T, C]; T must be a multiple of window_size (guaranteed by
        SNAC preprocess padding)."""
        b, t, c = x.shape
        residual = x
        h = self.norm(x)
        qkv = self.to_qkv(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        w = t // self.window_size

        def to_windows(z):
            z = z.reshape(b, w, self.window_size, self.heads, self.dim_head)
            return z.transpose(0, 3, 1, 2, 4)  # [B, H, W, N, D]

        q, k, v = to_windows(q), to_windows(k), to_windows(v)
        q = self._rotary(q)
        k = self._rotary(k)
        scale = 1.0 / math.sqrt(self.dim_head)
        scores = jnp.einsum("bhwnd,bhwmd->bhwnm", q, k) * scale
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhwnm,bhwmd->bhwnd", probs, v)
        out = out.transpose(0, 2, 3, 1, 4).reshape(b, t, c)
        return self.to_out(out) + residual


class EncoderBlock(Module):
    def __init__(self, output_dim=16, input_dim=None, stride=1, groups=1):
        input_dim = input_dim or output_dim // 2
        self.block = [
            ResidualUnit(input_dim, dilation=1, groups=groups),
            ResidualUnit(input_dim, dilation=3, groups=groups),
            ResidualUnit(input_dim, dilation=9, groups=groups),
            Snake1d(input_dim),
            WNConv1d(input_dim, output_dim, kernel_size=2 * stride, stride=stride,
                     padding=math.ceil(stride / 2)),
        ]

    def __call__(self, x):
        for layer in self.block:
            x = layer(x)
        return x


class Encoder(Module):
    def __init__(self, d_model=64, strides=(3, 3, 7, 7), depthwise=False,
                 attn_window_size=32):
        layers = [WNConv1d(1, d_model, kernel_size=7, padding=3)]
        for stride in strides:
            d_model *= 2
            groups = d_model // 2 if depthwise else 1
            layers.append(EncoderBlock(output_dim=d_model, stride=stride,
                                       groups=groups))
        if attn_window_size is not None:
            layers.append(LocalMHA(dim=d_model, window_size=attn_window_size))
        groups = d_model if depthwise else 1
        layers.append(WNConv1d(d_model, d_model, kernel_size=7, padding=3,
                               groups=groups))
        self.block = layers

    def __call__(self, x):
        for layer in self.block:
            x = layer(x)
        return x


class NoiseBlock(Module):
    def __init__(self, dim: int):
        self.linear = WNConv1d(dim, dim, kernel_size=1, bias=False)

    def __call__(self, x, key):
        b, t, c = x.shape
        noise = jax.random.normal(key, (b, t, 1), dtype=x.dtype)
        return x + noise * self.linear(x)


class DecoderBlock(Module):
    def __init__(self, input_dim=16, output_dim=8, stride=1, noise=False,
                 groups=1):
        self.pre = [
            Snake1d(input_dim),
            WNConvTranspose1d(input_dim, output_dim, kernel_size=2 * stride,
                              stride=stride, padding=math.ceil(stride / 2),
                              output_padding=stride % 2),
        ]
        self.noise_block = NoiseBlock(output_dim) if noise else None
        self.post = [
            ResidualUnit(output_dim, dilation=1, groups=groups),
            ResidualUnit(output_dim, dilation=3, groups=groups),
            ResidualUnit(output_dim, dilation=9, groups=groups),
        ]

    def __call__(self, x, key=None):
        for layer in self.pre:
            x = layer(x)
        if self.noise_block is not None:
            if key is None:
                key = jax.random.PRNGKey(0)
            x = self.noise_block(x, key)
        for layer in self.post:
            x = layer(x)
        return x


class Decoder(Module):
    def __init__(self, input_channel, channels, rates, noise=False,
                 depthwise=False, attn_window_size=32, d_out=1):
        if depthwise:
            pre = [
                WNConv1d(input_channel, input_channel, kernel_size=7, padding=3,
                         groups=input_channel),
                WNConv1d(input_channel, channels, kernel_size=1),
            ]
        else:
            pre = [WNConv1d(input_channel, channels, kernel_size=7, padding=3)]
        self.pre = pre
        self.attn = (
            LocalMHA(dim=channels, window_size=attn_window_size)
            if attn_window_size is not None else None
        )
        blocks = []
        output_dim = channels
        for i, stride in enumerate(rates):
            input_dim = channels // (2 ** i)
            output_dim = channels // (2 ** (i + 1))
            groups = output_dim if depthwise else 1
            blocks.append(DecoderBlock(input_dim, output_dim, stride, noise,
                                       groups=groups))
        self.blocks = blocks
        self.post = [Snake1d(output_dim), WNConv1d(output_dim, d_out, 7, padding=3)]

    def __call__(self, x, key=None):
        for layer in self.pre:
            x = layer(x)
        if self.attn is not None:
            x = self.attn(x)
        for i, block in enumerate(self.blocks):
            sub = jax.random.fold_in(key, i) if key is not None else None
            x = block(x, sub)
        for layer in self.post:
            x = layer(x)
        return jnp.tanh(x)


class VectorQuantize(Module):
    """Strided factorized VQ (reference vq.py:11-77): average-pool by the
    stride before quantization, repeat-interleave after."""

    def __init__(self, input_dim, codebook_size, codebook_dim, stride=1):
        self.stride = stride
        self.codebook_size = codebook_size
        self.in_proj = WNConv1d(input_dim, codebook_dim, kernel_size=1)
        self.out_proj = WNConv1d(codebook_dim, input_dim, kernel_size=1)
        self.codebook = Embedding(codebook_size, codebook_dim)

    def __call__(self, z):
        """z [B, T, D] -> (z_q [B, T, D], indices [B, T/stride])."""
        if self.stride > 1:
            b, t, d = z.shape
            z = z.reshape(b, t // self.stride, self.stride, d).mean(axis=2)
        z_e = self.in_proj(z)
        enc = _l2_normalize(z_e)
        cb = _l2_normalize(self.codebook.weight)
        dist = (
            jnp.sum(enc * enc, axis=-1, keepdims=True)
            - 2 * enc @ cb.T
            + jnp.sum(cb * cb, axis=-1)[None, None, :]
        )
        indices = jnp.argmin(dist, axis=-1).astype(jnp.int32)
        z_q = self.out_proj(self.codebook(indices))
        if self.stride > 1:
            z_q = jnp.repeat(z_q, self.stride, axis=1)
        return z_q, indices

    def decode_code(self, indices):
        z_q = self.out_proj(self.codebook(indices))
        if self.stride > 1:
            z_q = jnp.repeat(z_q, self.stride, axis=1)
        return z_q


class ResidualVectorQuantize(Module):
    def __init__(self, input_dim=512, codebook_size=1024, codebook_dim=8,
                 vq_strides=(1, 1, 1, 1)):
        self.n_codebooks = len(vq_strides)
        self.quantizers = [
            VectorQuantize(input_dim, codebook_size, codebook_dim, stride)
            for stride in vq_strides
        ]

    def __call__(self, z):
        z_q = 0
        residual = z
        codes = []
        for quantizer in self.quantizers:
            z_q_i, indices_i = quantizer(residual)
            z_q = z_q + z_q_i
            residual = residual - z_q_i
            codes.append(indices_i)
        return z_q, codes

    def from_codes(self, codes: List[jax.Array]) -> jax.Array:
        z_q = 0
        for i, c in enumerate(codes):
            z_q = z_q + self.quantizers[i].decode_code(c)
        return z_q


class SNAC(Module):
    def __init__(self, config=None, **kwargs):
        if isinstance(config, dict):
            config = SNACConfig.from_dict(config)
        if config is None:
            config = SNACConfig.from_dict(kwargs) if kwargs else SNACConfig()
        self.config = config
        self.sampling_rate = config.sampling_rate
        latent_dim = config.latent_dim or config.encoder_dim * (
            2 ** len(config.encoder_rates)
        )
        self.latent_dim = latent_dim
        self.hop_length = int(np.prod(config.encoder_rates))
        self.vq_strides = list(config.vq_strides)
        self.attn_window_size = config.attn_window_size
        self.encoder = Encoder(config.encoder_dim, config.encoder_rates,
                               depthwise=config.depthwise,
                               attn_window_size=config.attn_window_size)
        self.quantizer = ResidualVectorQuantize(
            input_dim=latent_dim, codebook_size=config.codebook_size,
            codebook_dim=config.codebook_dim, vq_strides=config.vq_strides,
        )
        self.decoder = Decoder(latent_dim, config.decoder_dim,
                               config.decoder_rates, config.noise,
                               depthwise=config.depthwise,
                               attn_window_size=config.attn_window_size)

    def preprocess(self, audio: jax.Array) -> jax.Array:
        """[B, 1, T] NCL -> padded [B, T', 1] NLC (reference snac.py:67-85)."""
        if audio.ndim == 3 and audio.shape[1] == 1:
            audio = jnp.swapaxes(audio, 1, 2)
        length = audio.shape[-2]
        lcm = np.lcm.reduce(self.vq_strides + ([self.attn_window_size] if self.attn_window_size else []))
        pad_to = self.hop_length * int(lcm)
        right_pad = math.ceil(length / pad_to) * pad_to - length
        if right_pad:
            audio = jnp.pad(audio, ((0, 0), (0, right_pad), (0, 0)))
        return audio

    def encode(self, audio: jax.Array) -> List[jax.Array]:
        return _snac_encode_jit(self, audio)

    def decode(self, codes: List[jax.Array], key=None) -> jax.Array:
        return _snac_decode_jit(self, codes, key)

    def _encode_impl(self, audio: jax.Array) -> List[jax.Array]:
        audio = self.preprocess(audio)
        z = self.encoder(audio)
        _, codes = self.quantizer(z)
        return codes

    def _decode_impl(self, codes: List[jax.Array], key=None) -> jax.Array:
        z_q = self.quantizer.from_codes(codes)
        t0 = z_q.shape[1]
        w = self.config.attn_window_size
        if w and t0 % w:
            # decoder-side LocalMHA windows need T % window == 0; only the
            # encode path guarantees that via preprocess padding, so pad
            # externally produced (e.g. LM-generated) codes and trim the
            # synthesized tail back off
            z_q = jnp.pad(z_q, ((0, 0), (0, w - t0 % w), (0, 0)))
        audio = self.decoder(z_q, key)
        if w and t0 % w:
            factor = audio.shape[1] // z_q.shape[1]
            audio = audio[:, : t0 * factor]
        return jnp.swapaxes(audio, 1, 2)  # [B, 1, T] NCL contract

    def __call__(self, audio: jax.Array, key=None):
        length = audio.shape[-1]
        x = self.preprocess(audio)
        z = self.encoder(x)
        z_q, codes = self.quantizer(z)
        out = self.decoder(z_q, key)
        return jnp.swapaxes(out, 1, 2)[..., :length], codes

    def sanitize(self, weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            v = np.asarray(v)
            if k.endswith("alpha") and v.ndim == 3:
                v = v.reshape(-1)
            elif (k.endswith("weight_v") or k.endswith("weight_g")) and v.ndim == 3:
                v = v.transpose(1, 2, 0)
            out[k] = v
        return out

    @classmethod
    def from_pretrained(cls, path_or_repo: str) -> "SNAC":
        """Load from a checkpoint directory or repo (hubertsiuzdak/snac_*
        config format; reference snac.py:127-155)."""
        from mlx_audio_tpu.codec.loading import (
            fetch_from_hub,
            load_config,
            load_safetensors,
        )
        from mlx_audio_tpu.nn.module import update_arrays

        path = fetch_from_hub(path_or_repo)
        model = cls(SNACConfig.from_dict(load_config(path)))
        weights = load_safetensors(path)
        return update_arrays(model, model.sanitize(weights), strict=False)


# jitted entry points: the codec rides along as a pytree argument, so its
# weights are traced inputs (eager calls re-trace with weights baked as
# constants — seconds per call over the device tunnel; docs/PERF.md)


@jax.jit
def _snac_encode_jit(codec, audio):
    return codec._encode_impl(audio)


@jax.jit
def _snac_decode_jit(codec, codes, key):
    return codec._decode_impl(codes, key)
