"""Descript Audio Codec (DAC) — RVQ-GAN codec at 16/24/44.1 kHz.

Capability parity with /root/reference/mlx_audio/codec/models/descript/
(dac.py:16-262, nn/layers.py:15-127, nn/quantize.py:16-117), NLC layout on
the shared weight-norm conv blocks.  Used by Dia and OuteTTS.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.models.base import BaseModelArgs
from mlx_audio_tpu.nn import Embedding, Module, WNConv1d, WNConvTranspose1d, snake


@dataclass
class DACConfig(BaseModelArgs):
    encoder_dim: int = 64
    encoder_rates: List[int] = field(default_factory=lambda: [2, 4, 5, 8])
    latent_dim: Optional[int] = None
    decoder_dim: int = 1536
    decoder_rates: List[int] = field(default_factory=lambda: [8, 5, 4, 2])
    n_codebooks: int = 32
    codebook_size: int = 1024
    codebook_dim: Union[int, list] = 8
    sample_rate: int = 44100


class Snake1d(Module):
    def __init__(self, channels: int):
        self.alpha = jnp.ones((channels,))

    def __call__(self, x):
        return snake(x, self.alpha)


class ResidualUnit(Module):
    def __init__(self, dim: int = 16, dilation: int = 1, kernel: int = 7,
                 groups: int = 1):
        pad = ((kernel - 1) * dilation) // 2
        self.block = [
            Snake1d(dim),
            WNConv1d(dim, dim, kernel, dilation=dilation, padding=pad, groups=groups),
            Snake1d(dim),
            WNConv1d(dim, dim, 1),
        ]

    def __call__(self, x):
        y = x
        for layer in self.block:
            y = layer(y)
        pad = (x.shape[-2] - y.shape[-2]) // 2
        if pad > 0:
            x = x[..., pad:-pad, :]
        return x + y


class EncoderBlock(Module):
    def __init__(self, dim: int = 16, stride: int = 1, groups: int = 1):
        self.block = [
            ResidualUnit(dim // 2, dilation=1, groups=groups),
            ResidualUnit(dim // 2, dilation=3, groups=groups),
            ResidualUnit(dim // 2, dilation=9, groups=groups),
            Snake1d(dim // 2),
            WNConv1d(dim // 2, dim, kernel_size=2 * stride, stride=stride,
                     padding=math.ceil(stride / 2)),
        ]

    def __call__(self, x):
        for layer in self.block:
            x = layer(x)
        return x


class Encoder(Module):
    def __init__(self, d_model: int = 64, strides: list = (2, 4, 8, 8),
                 d_latent: int = 64):
        block = [WNConv1d(1, d_model, kernel_size=7, padding=3)]
        for stride in strides:
            d_model *= 2
            block.append(EncoderBlock(d_model, stride=stride))
        block += [Snake1d(d_model), WNConv1d(d_model, d_latent, 3, padding=1)]
        self.block = block
        self.enc_dim = d_model

    def __call__(self, x):
        """[B, T, 1] -> [B, T/hop, d_latent]."""
        for layer in self.block:
            x = layer(x)
        return x


class DecoderBlock(Module):
    def __init__(self, input_dim: int = 16, output_dim: int = 8, stride: int = 1):
        self.block = [
            Snake1d(input_dim),
            WNConvTranspose1d(input_dim, output_dim, kernel_size=2 * stride,
                              stride=stride, padding=math.ceil(stride / 2)),
            ResidualUnit(output_dim, dilation=1),
            ResidualUnit(output_dim, dilation=3),
            ResidualUnit(output_dim, dilation=9),
        ]

    def __call__(self, x):
        for layer in self.block:
            x = layer(x)
        return x


class Decoder(Module):
    def __init__(self, input_channel, channels, rates, d_out: int = 1):
        layers = [WNConv1d(input_channel, channels, kernel_size=7, padding=3)]
        output_dim = channels
        for i, stride in enumerate(rates):
            input_dim = channels // 2 ** i
            output_dim = channels // 2 ** (i + 1)
            layers.append(DecoderBlock(input_dim, output_dim, stride))
        layers += [Snake1d(output_dim), WNConv1d(output_dim, d_out, 7, padding=3)]
        self.model = layers

    def __call__(self, x):
        for layer in self.model:
            x = layer(x)
        return jnp.tanh(x)


def _l2_normalize(x, axis=-1, eps=1e-12):
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


class VectorQuantize(Module):
    """Factorized VQ with L2-normalized lookup (reference nn/quantize.py:16)."""

    def __init__(self, input_dim: int, codebook_size: int, codebook_dim: int):
        self.codebook_size = codebook_size
        self.in_proj = WNConv1d(input_dim, codebook_dim, kernel_size=1)
        self.out_proj = WNConv1d(codebook_dim, input_dim, kernel_size=1)
        self.codebook = Embedding(codebook_size, codebook_dim)

    def decode_latents(self, z_e):
        """z_e [B, T, D] -> (z_q [B, T, D], indices [B, T])."""
        enc = _l2_normalize(z_e)
        cb = _l2_normalize(self.codebook.weight)
        # squared L2 distance after normalization reduces to -2 * cosine
        dist = (
            jnp.sum(enc * enc, axis=-1, keepdims=True)
            - 2 * enc @ cb.T
            + jnp.sum(cb * cb, axis=-1)[None, None, :]
        )
        indices = jnp.argmin(dist, axis=-1).astype(jnp.int32)
        z_q = self.codebook(indices)
        return z_q, indices

    def __call__(self, z):
        """z [B, T, input_dim] -> (z_q, commitment/codebook residual info)."""
        z_e = self.in_proj(z)
        z_q, indices = self.decode_latents(z_e)
        z_q_out = self.out_proj(z_q)
        return z_q_out, indices, z_e

    def decode_code(self, indices):
        return self.out_proj(self.codebook(indices))


class ResidualVectorQuantize(Module):
    def __init__(self, input_dim: int = 512, n_codebooks: int = 9,
                 codebook_size: int = 1024, codebook_dim: Union[int, list] = 8):
        if isinstance(codebook_dim, int):
            codebook_dim = [codebook_dim] * n_codebooks
        self.n_codebooks = n_codebooks
        self.quantizers = [
            VectorQuantize(input_dim, codebook_size, codebook_dim[i])
            for i in range(n_codebooks)
        ]

    def __call__(self, z, n_quantizers: Optional[int] = None):
        """z [B, T, D] -> (z_q, codes [B, nq, T], latents [B, T, sum(dims)])."""
        n_quantizers = n_quantizers or self.n_codebooks
        z_q = 0
        residual = z
        codes, latents = [], []
        for i, quantizer in enumerate(self.quantizers):
            if i >= n_quantizers:
                break
            z_q_i, indices_i, z_e_i = quantizer(residual)
            z_q = z_q + z_q_i
            residual = residual - z_q_i
            codes.append(indices_i)
            latents.append(z_e_i)
        return z_q, jnp.stack(codes, axis=1), jnp.concatenate(latents, axis=-1)

    def from_codes(self, codes):
        """codes [B, nq, T] -> z_q [B, T, D]."""
        z_q = 0
        for i in range(codes.shape[1]):
            z_q = z_q + self.quantizers[i].decode_code(codes[:, i])
        return z_q


class DAC(Module):
    def __init__(self, config: Union[DACConfig, dict, None] = None, **kwargs):
        if isinstance(config, dict):
            config = DACConfig.from_dict(config)
        if config is None:
            config = DACConfig.from_dict(kwargs) if kwargs else DACConfig()
        self.config = config
        latent_dim = config.latent_dim or config.encoder_dim * (
            2 ** len(config.encoder_rates)
        )
        self.latent_dim = latent_dim
        self.hop_length = int(np.prod(config.encoder_rates))
        self.sample_rate = config.sample_rate
        self.n_codebooks = config.n_codebooks
        self.codebook_size = config.codebook_size
        self.encoder = Encoder(config.encoder_dim, config.encoder_rates, latent_dim)
        self.quantizer = ResidualVectorQuantize(
            input_dim=latent_dim, n_codebooks=config.n_codebooks,
            codebook_size=config.codebook_size, codebook_dim=config.codebook_dim,
        )
        self.decoder = Decoder(latent_dim, config.decoder_dim, config.decoder_rates)

    def preprocess(self, audio: jax.Array) -> jax.Array:
        """[B, 1, T] NCL -> [B, T_pad, 1] NLC padded to whole hops."""
        if audio.ndim == 3 and audio.shape[1] == 1:
            audio = jnp.swapaxes(audio, 1, 2)
        length = audio.shape[-2]
        right_pad = math.ceil(length / self.hop_length) * self.hop_length - length
        if right_pad:
            audio = jnp.pad(audio, ((0, 0), (0, right_pad), (0, 0)))
        return audio

    def encode(self, audio: jax.Array, n_quantizers: Optional[int] = None):
        """[B, 1, T] -> (z [B, T', D], codes [B, nq, T'], latents)."""
        return _dac_encode_jit(self, audio, n_quantizers)

    def decode(self, z: jax.Array) -> jax.Array:
        """z [B, T', D] -> audio [B, 1, T] (NCL, as reference)."""
        return _dac_decode_jit(self, z)

    def _encode_impl(self, audio: jax.Array, n_quantizers: Optional[int] = None):
        audio = self.preprocess(audio)
        z = self.encoder(audio)
        return self.quantizer(z, n_quantizers)

    def _decode_impl(self, z: jax.Array) -> jax.Array:
        audio = self.decoder(z)
        return jnp.swapaxes(audio, 1, 2)

    def decode_codes(self, codes: jax.Array) -> jax.Array:
        return self.decode(self.quantizer.from_codes(codes))

    # -- chunked compression (reference descript/base.py:16-228) ----------

    @property
    def delay(self) -> int:
        from mlx_audio_tpu.codec.dac.chunked import get_delay

        return get_delay(self)

    def get_output_length(self, input_length: int) -> int:
        from mlx_audio_tpu.codec.dac.chunked import get_output_length

        return get_output_length(self, input_length)

    def compress(self, audio, win_duration: float = 1.0,
                 normalize_db: Optional[float] = -16,
                 n_quantizers: Optional[int] = None):
        """audio (array or path) -> DACFile (windowed valid-conv encode;
        all windows batched through one jitted call)."""
        from mlx_audio_tpu.codec.dac.chunked import compress

        return compress(self, audio, win_duration=win_duration,
                        normalize_db=normalize_db, n_quantizers=n_quantizers)

    def decompress(self, obj, normalize_db: Optional[float] = -16):
        """DACFile (or .dac path) -> waveform [1, T]."""
        from mlx_audio_tpu.codec.dac.chunked import decompress

        return decompress(self, obj, normalize_db=normalize_db)

    def __call__(self, audio: jax.Array, n_quantizers: Optional[int] = None):
        length = audio.shape[-1]
        z, codes, latents = self.encode(audio, n_quantizers)
        out = self.decode(z)
        return {"audio": out[..., :length], "z": z, "codes": codes,
                "latents": latents}

    def sanitize(self, weights: dict) -> dict:
        """MLX-descript checkpoint layouts: conv v/g are [O, K, I]-major and
        convT v/g are [O?, K, I]-major with per-in g — a single (1,2,0)
        transpose maps every 3-d tensor to our [K, I, O] / [1, I, 1] layouts;
        snake alphas flatten to [C].  HF-transformers `DacModel` checkpoints
        (descript/dac_16khz format: folded weights, res_unit naming) are
        auto-detected."""
        if any(".res_unit" in k for k in weights):
            return sanitize_hf_dac(weights)
        out = {}
        for k, v in weights.items():
            v = np.asarray(v)
            if k.endswith("alpha") and v.ndim == 3:
                v = v.reshape(-1)
            elif (k.endswith("weight_v") or k.endswith("weight_g")) and v.ndim == 3:
                v = v.transpose(1, 2, 0)
            out[k] = v
        return out

    # HF-transformers DacConfig field names -> DACConfig
    _HF_CFG_MAP = {
        "encoder_hidden_size": "encoder_dim",
        "downsampling_ratios": "encoder_rates",
        "decoder_hidden_size": "decoder_dim",
        "upsampling_ratios": "decoder_rates",
        "hidden_size": "latent_dim",
        "sampling_rate": "sample_rate",
    }

    @classmethod
    def from_pretrained(cls, path_or_repo: str) -> "DAC":
        """Load from a checkpoint directory or repo: HF-transformers
        descript/dac_* layout or mlx-community conversions (reference
        dac.py:252-285)."""
        from mlx_audio_tpu.codec.loading import (
            fetch_from_hub,
            load_config,
            load_safetensors,
        )
        from mlx_audio_tpu.nn.module import update_arrays

        path = fetch_from_hub(path_or_repo)
        config = load_config(path)
        for hf_k, our_k in cls._HF_CFG_MAP.items():
            if hf_k in config and our_k not in config:
                config[our_k] = config[hf_k]
        model = cls(DACConfig.from_dict(config))
        weights = load_safetensors(path)
        return update_arrays(model, model.sanitize(weights), strict=False)


def _wn_split_conv(w: np.ndarray):
    """Folded torch conv weight [O, I, K] -> (weight_v [K, I, O],
    weight_g [1, 1, O]) with g = ||w|| over (I, K), so g * v/||v|| == w."""
    g = np.sqrt((w ** 2).sum(axis=(1, 2), keepdims=True))  # [O, 1, 1]
    return w.transpose(2, 1, 0), g.transpose(2, 1, 0)


def _wn_split_convt(w: np.ndarray):
    """Folded torch convT weight [I, O, K] -> (weight_v [K, I, O],
    weight_g [1, I, 1]); torch weight_norm dim=0 puts g on the input axis."""
    g = np.sqrt((w ** 2).sum(axis=(1, 2), keepdims=True))  # [I, 1, 1]
    return w.transpose(2, 0, 1), g.transpose(1, 0, 2)


def sanitize_hf_dac(weights: dict) -> dict:
    """Map HF-transformers `DacModel` checkpoints (descript/dac_* format) to
    our paths.  HF stores folded (weight-norm-removed) weights with
    res_unit naming; we re-split into (g, v) pairs — g = ||w||, v = w —
    which reproduces w exactly.  Golden parity in tests/test_golden_hf.py."""
    import re

    n_enc = 1 + max((int(m.group(1)) for k in weights
                     if (m := re.match(r"encoder\.block\.(\d+)\.", k))),
                    default=-1)
    n_dec = 1 + max((int(m.group(1)) for k in weights
                     if (m := re.match(r"decoder\.block\.(\d+)\.", k))),
                    default=-1)

    def remap(k: str) -> tuple[str, bool]:
        """-> (our path, is_transposed_conv)."""
        m = re.match(r"encoder\.block\.(\d+)\.(.*)$", k)
        if m:
            i, rest = int(m.group(1)), m.group(2)
            ru = re.match(r"res_unit(\d)\.(snake1|conv1|snake2|conv2)\.(.*)$", rest)
            if ru:
                unit = int(ru.group(1)) - 1
                slot = {"snake1": 0, "conv1": 1, "snake2": 2, "conv2": 3}[ru.group(2)]
                return (f"encoder.block.{i + 1}.block.{unit}.block.{slot}."
                        f"{ru.group(3)}"), False
            if rest.startswith("snake1."):
                return f"encoder.block.{i + 1}.block.3.{rest[7:]}", False
            return f"encoder.block.{i + 1}.block.4.{rest[6:]}", False  # conv1.
        m = re.match(r"decoder\.block\.(\d+)\.(.*)$", k)
        if m:
            i, rest = int(m.group(1)), m.group(2)
            ru = re.match(r"res_unit(\d)\.(snake1|conv1|snake2|conv2)\.(.*)$", rest)
            if ru:
                unit = int(ru.group(1)) + 1  # decoder block: snake, convT, units
                slot = {"snake1": 0, "conv1": 1, "snake2": 2, "conv2": 3}[ru.group(2)]
                return (f"decoder.model.{i + 1}.block.{unit}.block.{slot}."
                        f"{ru.group(3)}"), False
            if rest.startswith("snake1."):
                return f"decoder.model.{i + 1}.block.0.{rest[7:]}", False
            return f"decoder.model.{i + 1}.block.1.{rest[8:]}", True  # conv_t1.
        fixed = {
            "encoder.conv1": "encoder.block.0",
            "encoder.snake1": f"encoder.block.{n_enc + 1}",
            "encoder.conv2": f"encoder.block.{n_enc + 2}",
            "decoder.conv1": "decoder.model.0",
            "decoder.snake1": f"decoder.model.{n_dec + 1}",
            "decoder.conv2": f"decoder.model.{n_dec + 2}",
        }
        for pre, target in fixed.items():
            if k.startswith(pre + "."):
                return target + k[len(pre):], False
        return k, False  # quantizer.* paths already match

    out = {}
    for k, v in weights.items():
        v = np.asarray(v)
        k, is_convt = remap(k)
        # snake alphas are exposed as plain "alpha" on both sides
        if k.endswith(".alpha"):
            out[k] = v.reshape(-1)
        elif k.endswith(".weight") and v.ndim == 3:
            base = k[: -len(".weight")]
            vv, g = _wn_split_convt(v) if is_convt else _wn_split_conv(v)
            out[base + ".weight_v"] = vv
            out[base + ".weight_g"] = g
        else:
            out[k] = v
    return out


# jitted entry points (codec as pytree argument; see docs/PERF.md)
import functools as _functools


@_functools.partial(jax.jit, static_argnames=("n_quantizers",))
def _dac_encode_jit(codec, audio, n_quantizers=None):
    return codec._encode_impl(audio, n_quantizers)


@jax.jit
def _dac_decode_jit(codec, z):
    return codec._decode_impl(z)
