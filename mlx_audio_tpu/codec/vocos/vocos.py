"""Vocos — mel (or EnCodec-token) -> waveform vocoder via ConvNeXt + ISTFT.

Capability parity with /root/reference/mlx_audio/codec/models/vocos/
vocos.py:25-359 + mel.py, NLC layout, matmul-DFT ISTFT head.  Also reused
as Spark-TTS's feature encoder/decoder backbone.
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu import dsp
from mlx_audio_tpu.nn import Conv1d, LayerNorm, Linear, Module


def log_mel_spectrogram(
    audio: jax.Array,
    sample_rate: int = 24_000,
    n_mels: int = 100,
    n_fft: int = 1024,
    hop_length: int = 256,
    padding: int = 0,
) -> jax.Array:
    """[T] or [B, T] -> [B, frames, n_mels] (reference mel.py:8-33: HTK mel,
    natural log, 1e-5 floor, last frame dropped)."""
    audio = jnp.asarray(audio, dtype=jnp.float32)
    if audio.ndim == 1:
        audio = audio[None]
    if padding > 0:
        audio = jnp.pad(audio, ((0, 0), (0, padding)))
    re, im = dsp.stft_realimag(audio, n_fft, hop_length, n_fft,
                               "hann_periodic", center=True)  # torchaudio
    mag = jnp.sqrt(re * re + im * im)[..., :-1, :]
    fb = dsp.mel_filters(sample_rate, n_fft, n_mels, norm=None, mel_scale="htk")
    mel = mag @ fb.T
    return jnp.log(jnp.maximum(mel, 1e-5))


class MelSpectrogramFeatures(Module):
    def __init__(self, sample_rate=24_000, n_fft=1024, hop_length=256,
                 n_mels=100, padding="center"):
        if padding != "center":
            # 'same' exists upstream but is unimplemented here — failing
            # loudly beats silently time-shifted audio
            raise NotImplementedError(
                "MelSpectrogramFeatures supports padding='center' only"
            )
        self.sample_rate = sample_rate
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.n_mels = n_mels

    def __call__(self, audio: jax.Array, **kwargs) -> jax.Array:
        return log_mel_spectrogram(
            audio, sample_rate=self.sample_rate, n_mels=self.n_mels,
            n_fft=self.n_fft, hop_length=self.hop_length,
        )


class EncodecFeatures(Module):
    """EnCodec-token feature mode (reference vocos.py:54-116): codebook
    embeddings summed over quantizer levels."""

    def __init__(self, encodec, bandwidths: List[float] = (1.5, 3.0, 6.0, 12.0)):
        self.encodec = encodec
        self.bandwidths = list(bandwidths)
        num_q = encodec.quantizer.get_num_quantizers_for_bandwidth(max(bandwidths))
        self.codebook_weights = jnp.concatenate(
            [vq.codebook.embed for vq in encodec.quantizer.layers[:num_q]]
        )
        self.codebook_size = encodec.quantizer.codebook_size

    def get_encodec_codes(self, audio, bandwidth_id: int):
        codes = self.encodec.encode(
            audio, bandwidth=self.bandwidths[int(bandwidth_id)]
        )[0]
        return codes

    def get_features_from_codes(self, codes: jax.Array) -> jax.Array:
        """codes [nq, B, T] -> features [B, T, D]."""
        offsets = jnp.arange(codes.shape[0]) * self.codebook_size
        idx = codes + offsets[:, None, None]
        emb = jnp.take(self.codebook_weights, idx, axis=0)
        return jnp.sum(emb, axis=0)

    def __call__(self, audio, **kwargs):
        bandwidth_id = kwargs.get("bandwidth_id")
        if bandwidth_id is None:
            raise ValueError("The 'bandwidth_id' argument is required")
        codes = self.get_encodec_codes(audio, bandwidth_id)
        return self.get_features_from_codes(codes)


class AdaLayerNorm(Module):
    """Bandwidth-conditioned LN (reference vocos.py:195-214): scale/shift
    selected by a one-hot conditioning id."""

    def __init__(self, num_embeddings: int, embedding_dim: int, eps: float = 1e-6):
        self.eps = eps
        self.scale = Linear(num_embeddings, embedding_dim)
        self.shift = Linear(num_embeddings, embedding_dim)

    def __call__(self, x: jax.Array, cond_embedding: jax.Array) -> jax.Array:
        cond = jnp.asarray(cond_embedding)
        if jnp.issubdtype(cond.dtype, jnp.integer):
            # EnCodec-mode API passes the integer bandwidth id (reference
            # vocos.py:242-252); a one-hot through the Linear is exactly the
            # original torch Embedding lookup
            n_emb = self.scale.weight.shape[1]
            cond = jax.nn.one_hot(cond.reshape(-1), n_emb, dtype=x.dtype)
        scale = self.scale(cond)
        shift = self.shift(cond)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return x * scale[:, None, :] + shift[:, None, :]


class ConvNeXtBlock(Module):
    def __init__(self, dim: int, intermediate_dim: int,
                 layer_scale_init_value: float,
                 adanorm_num_embeddings: Optional[int] = None):
        self.dwconv = Conv1d(dim, dim, kernel_size=7, padding=3, groups=dim)
        self.adanorm = adanorm_num_embeddings is not None
        if adanorm_num_embeddings:
            self.norm = AdaLayerNorm(adanorm_num_embeddings, dim, eps=1e-6)
        else:
            self.norm = LayerNorm(dim, eps=1e-6)
        self.pwconv1 = Linear(dim, intermediate_dim)
        self.pwconv2 = Linear(intermediate_dim, dim)
        self.gamma = (
            layer_scale_init_value * jnp.ones((dim,))
            if layer_scale_init_value > 0 else None
        )

    def __call__(self, x, cond_embedding_id=None):
        residual = x
        x = self.dwconv(x)
        if self.adanorm:
            x = self.norm(x, cond_embedding_id)
        else:
            x = self.norm(x)
        x = self.pwconv2(jax.nn.gelu(self.pwconv1(x), approximate=False))
        if self.gamma is not None:
            x = self.gamma * x
        return residual + x


class VocosBackbone(Module):
    def __init__(self, input_channels: int, dim: int, intermediate_dim: int,
                 num_layers: int, layer_scale_init_value: Optional[float] = None,
                 adanorm_num_embeddings: Optional[int] = None, bias: bool = True):
        self.input_channels = input_channels
        self.embed = Conv1d(input_channels, dim, kernel_size=7, padding=3)
        self.adanorm = adanorm_num_embeddings is not None
        if adanorm_num_embeddings:
            self.norm = AdaLayerNorm(adanorm_num_embeddings, dim, eps=1e-6)
        else:
            self.norm = LayerNorm(dim, eps=1e-6)
        lsiv = layer_scale_init_value or 1 / num_layers
        self.convnext = [
            ConvNeXtBlock(dim, intermediate_dim, lsiv, adanorm_num_embeddings)
            for _ in range(num_layers)
        ]
        self.final_layer_norm = LayerNorm(dim, eps=1e-6, affine=True)

    def __call__(self, x: jax.Array, **kwargs) -> jax.Array:
        """x: [B, T, input_channels] (NLC)."""
        bandwidth_id = kwargs.get("bandwidth_id")
        if x.shape[-1] != self.input_channels:
            x = jnp.swapaxes(x, -1, -2)
        x = self.embed(x)
        if self.adanorm:
            x = self.norm(x, bandwidth_id)
        else:
            x = self.norm(x)
        for block in self.convnext:
            x = block(x, cond_embedding_id=bandwidth_id)
        return self.final_layer_norm(x)


class ISTFTHead(Module):
    def __init__(self, dim: int, n_fft: int, hop_length: int,
                 padding: str = "center"):
        if padding != "center":
            raise NotImplementedError(
                "ISTFTHead supports padding='center' only"
            )
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.out = Linear(dim, n_fft + 2)

    def __call__(self, x: jax.Array) -> jax.Array:
        """[B, T, dim] -> audio [B, samples] (reference vocos.py:119-142)."""
        h = self.out(x)
        mag, p = jnp.split(h, 2, axis=-1)
        mag = jnp.clip(jnp.exp(mag), None, 1e2)
        re = mag * jnp.cos(p)
        im = mag * jnp.sin(p)
        spec = jax.lax.complex(re, im)
        return dsp.istft(
            jnp.swapaxes(spec, -1, -2), self.hop_length, self.n_fft,
            "hann_periodic", center=True,  # torch.istft-trained
        )


class Vocos(Module):
    def __init__(self, feature_extractor, backbone: VocosBackbone,
                 head: ISTFTHead):
        self.feature_extractor = feature_extractor
        self.backbone = backbone
        self.head = head

    @classmethod
    def from_hparams(cls, config: dict) -> "Vocos":
        fe_cfg = config["feature_extractor"]
        if "MelSpectrogramFeatures" in fe_cfg["class_path"]:
            feature_extractor = MelSpectrogramFeatures(**fe_cfg["init_args"])
        elif "EncodecFeatures" in fe_cfg["class_path"]:
            from mlx_audio_tpu.codec.encodec import Encodec

            raise NotImplementedError(
                "EncodecFeatures from_hparams requires an EnCodec checkpoint; "
                "construct EncodecFeatures directly"
            )
        backbone = VocosBackbone(**config["backbone"]["init_args"])
        head = ISTFTHead(**config["head"]["init_args"])
        return cls(feature_extractor, backbone, head)

    @classmethod
    def from_pretrained(cls, path_or_repo: str) -> "Vocos":
        import yaml
        from pathlib import Path

        from mlx_audio_tpu.nn.module import update_arrays
        from mlx_audio_tpu.utils.loader import get_model_path

        path = Path(get_model_path(path_or_repo))
        from safetensors.numpy import load_file

        weights = load_file(str(path / "model.safetensors"))
        with open(path / "config.yaml") as f:
            config = yaml.safe_load(f)
        model = cls.from_hparams(config)
        return update_arrays(model, model.sanitize(weights), strict=False)

    def sanitize(self, weights: dict) -> dict:
        """MLX-vocos checkpoints: conv weights [O, K, I] -> [K, I, O] (the
        reference applies moveaxis on embed/dwconv at load, vocos.py:322-330)."""
        out = {}
        for k, v in weights.items():
            v = np.asarray(v)
            if "window" in k:
                continue
            if k.endswith(".weight") and v.ndim == 3:
                out[k] = v.transpose(1, 2, 0)
            elif (v.ndim == 2 and v.shape[0] < v.shape[1]
                    and (k.endswith("norm.scale.weight")
                         or k.endswith("norm.shift.weight"))):
                # upstream torch AdaLayerNorm stores these as Embedding
                # tables [num_embeddings, dim]; our Linear is [dim, num_emb]
                out[k] = v.T
            else:
                out[k] = v
        return out

    def __call__(self, audio: jax.Array, **kwargs) -> jax.Array:
        features = self.feature_extractor(audio, **kwargs)
        return self.decode(features, **kwargs)

    def decode(self, features: jax.Array, **kwargs) -> jax.Array:
        if not kwargs:
            return _vocos_decode_jit(self, features)
        x = self.backbone(features, **kwargs)
        return self.head(x)

    def _decode_impl(self, features: jax.Array) -> jax.Array:
        x = self.backbone(features)
        return self.head(x)

    def decode_from_codes(self, codes: jax.Array, **kwargs) -> jax.Array:
        features = self.feature_extractor.get_features_from_codes(codes)
        return self.decode(features, **kwargs)


# jitted entry point (model as pytree argument; see docs/PERF.md)


@jax.jit
def _vocos_decode_jit(model, features):
    return model._decode_impl(features)
