"""Spark-TTS BiCodec: semantic (FactorizedVQ) + global (speaker FSQ) codec.

Capability parity with /root/reference/mlx_audio/tts/models/spark/bicodec.py
and modules/encoder_decoder/{feat_encoder,feat_decoder,wave_generator}.py.

TPU design:
* NLC layout end to end — no per-module transposes (the reference flips
  layout at every block boundary, bicodec.py:87-95).
* Mel front-end is the shared matmul-DFT STFT (dsp.stft_realimag), batched
  over the reference batch instead of a per-sample Python loop
  (reference get_mel_spectrogram, bicodec.py:227-240).
* detokenize() is a pure jittable graph: token arrays in, waveform out.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import re

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu import dsp
from mlx_audio_tpu.codec.dac.dac import ResidualUnit, Snake1d
from mlx_audio_tpu.codec.vocos.vocos import VocosBackbone
from mlx_audio_tpu.nn import Linear, Module, WNConv1d, WNConvTranspose1d

from .modules import FactorizedVectorQuantize, SamplingBlock, SpeakerEncoder


def mel_spectrogram(audio: jax.Array, sample_rate: int = 16_000,
                    n_mels: int = 128, n_fft: int = 1024, f_min: int = 10,
                    f_max: Optional[int] = None, hop_length: int = 320,
                    win_length: int = 640) -> jax.Array:
    """audio [B, T] -> mel [B, frames, n_mels] (reference bicodec.py:22-52).

    Periodic hann of win_length, center-padded STFT, slaney/slaney mels.
    """
    audio = jnp.atleast_2d(audio)
    re, im = dsp.stft_realimag(
        audio, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
        window="hann_periodic", center=True,  # torchaudio-trained
    )
    mag = jnp.sqrt(re * re + im * im + 1e-12)  # [B, frames, bins]
    filters = dsp.mel_filters(
        sample_rate, n_fft, n_mels, f_min=f_min, f_max=f_max,
        norm="slaney", mel_scale="slaney",
    )  # [n_mels, bins]
    return jnp.einsum("btf,mf->btm", mag, filters)


class Encoder(Module):
    """Vocos + downsampling feature encoder (feat_encoder.py:26-95)."""

    def __init__(self, input_channels: int, vocos_dim: int,
                 vocos_intermediate_dim: int, vocos_num_layers: int,
                 out_channels: int, sample_ratios: List[int] = (1, 1)):
        self.encoder = VocosBackbone(
            input_channels=input_channels, dim=vocos_dim,
            intermediate_dim=vocos_intermediate_dim,
            num_layers=vocos_num_layers,
        )
        self.downsample = [
            [
                SamplingBlock(dim=vocos_dim, groups=vocos_dim,
                              downsample_scale=ratio),
                VocosBackbone(input_channels=vocos_dim, dim=vocos_dim,
                              intermediate_dim=vocos_intermediate_dim,
                              num_layers=2),
            ]
            for ratio in sample_ratios
        ]
        self.project = Linear(vocos_dim, out_channels)

    def __call__(self, x: jax.Array) -> jax.Array:
        """feat [B, T, input_channels] -> z [B, T', out_channels]."""
        x = self.encoder(x)
        for block, backbone in self.downsample:
            x = backbone(block(x))
        return self.project(x)


class Decoder(Module):
    """Vocos + upsampling feature decoder with optional speaker conditioning
    (feat_decoder.py:27-97)."""

    def __init__(self, input_channels: int, vocos_dim: int,
                 vocos_intermediate_dim: int, vocos_num_layers: int,
                 out_channels: int, condition_dim: Optional[int] = None,
                 sample_ratios: List[int] = (1, 1),
                 use_tanh_at_final: bool = False):
        self.linear_pre = Linear(input_channels, vocos_dim)
        self.downsample = [
            [
                SamplingBlock(dim=vocos_dim, groups=vocos_dim,
                              upsample_scale=ratio),
                VocosBackbone(input_channels=vocos_dim, dim=vocos_dim,
                              intermediate_dim=vocos_intermediate_dim,
                              num_layers=2),
            ]
            for ratio in sample_ratios
        ]
        self.vocos_backbone = VocosBackbone(
            input_channels=vocos_dim, dim=vocos_dim,
            intermediate_dim=vocos_intermediate_dim,
            num_layers=vocos_num_layers,
            adanorm_num_embeddings=condition_dim,
        )
        self.linear = Linear(vocos_dim, out_channels)
        self.use_tanh_at_final = use_tanh_at_final

    def __call__(self, x: jax.Array, c: Optional[jax.Array] = None) -> jax.Array:
        """z [B, T, input_channels] (+ condition [B, condition_dim]) ->
        [B, T * prod(ratios), out_channels]."""
        x = self.linear_pre(x)
        for block, backbone in self.downsample:
            x = backbone(block(x))
        x = self.vocos_backbone(x, bandwidth_id=c)
        x = self.linear(x)
        if self.use_tanh_at_final:
            x = jnp.tanh(x)
        return x


class DecoderBlock(Module):
    def __init__(self, input_dim: int, output_dim: int, kernel_size: int,
                 stride: int):
        self.block = [
            Snake1d(input_dim),
            WNConvTranspose1d(input_dim, output_dim, kernel_size=kernel_size,
                              stride=stride, padding=(kernel_size - stride) // 2),
            ResidualUnit(output_dim, dilation=1),
            ResidualUnit(output_dim, dilation=3),
            ResidualUnit(output_dim, dilation=9),
        ]

    def __call__(self, x):
        for m in self.block:
            x = m(x)
        return x


class WaveGenerator(Module):
    """DAC-style upsampling vocoder with explicit kernel sizes
    (wave_generator.py:39-72)."""

    def __init__(self, input_channel: int, channels: int, rates: List[int],
                 kernel_sizes: List[int], d_out: int = 1):
        layers = [WNConv1d(input_channel, channels, kernel_size=7, padding=3)]
        output_dim = channels
        for i, (kernel_size, stride) in enumerate(zip(kernel_sizes, rates)):
            input_dim = channels // 2 ** i
            output_dim = channels // 2 ** (i + 1)
            layers.append(DecoderBlock(input_dim, output_dim, kernel_size, stride))
        layers += [
            Snake1d(output_dim),
            WNConv1d(output_dim, d_out, kernel_size=7, padding=3),
        ]
        self.model = layers

    def __call__(self, x: jax.Array) -> jax.Array:
        """[B, T, C] -> [B, T*prod(rates), d_out], tanh-squashed."""
        for m in self.model:
            x = m(x)
        return jnp.tanh(x)


DEFAULT_BICODEC_CONFIG: Dict[str, Any] = {
    # SparkAudio/Spark-TTS-0.5B BiCodec/config.yaml (audio_tokenizer section)
    "mel_params": {
        "sample_rate": 16000, "n_fft": 1024, "win_length": 640,
        "hop_length": 320, "mel_fmin": 10, "mel_fmax": None, "num_mels": 128,
    },
    "encoder": {
        "input_channels": 1024, "vocos_dim": 384,
        "vocos_intermediate_dim": 2048, "vocos_num_layers": 12,
        "out_channels": 1024, "sample_ratios": [1, 1],
    },
    "decoder": {
        "input_channel": 1024, "channels": 1536, "rates": [8, 5, 4, 2],
        "kernel_sizes": [16, 11, 8, 4],
    },
    "quantizer": {
        "input_dim": 1024, "codebook_size": 8192, "codebook_dim": 8,
    },
    "speaker_encoder": {
        "input_dim": 128, "out_dim": 1024, "latent_dim": 128, "token_num": 32,
        "fsq_levels": [4, 4, 4, 4, 4, 4], "fsq_num_quantizers": 1,
    },
    "prenet": {
        "input_channels": 1024, "vocos_dim": 384,
        "vocos_intermediate_dim": 2048, "vocos_num_layers": 12,
        "out_channels": 1024, "condition_dim": 1024,
        "sample_ratios": [1, 1], "use_tanh_at_final": False,
    },
    "postnet": {
        "input_channels": 1024, "vocos_dim": 384,
        "vocos_intermediate_dim": 2048, "vocos_num_layers": 6,
        "out_channels": 1024, "sample_ratios": [1, 1],
        "use_tanh_at_final": False,
    },
}


class BiCodec(Module):
    """Speaker-conditioned two-stream codec (reference bicodec.py:55-240)."""

    def __init__(self, config: Optional[Dict[str, Any]] = None):
        config = config or DEFAULT_BICODEC_CONFIG
        self.config = {**DEFAULT_BICODEC_CONFIG, **config}
        self.mel_params = self.config["mel_params"]
        self.encoder = Encoder(**self.config["encoder"])
        self.quantizer = FactorizedVectorQuantize(**self.config["quantizer"])
        self.prenet = Decoder(**self.config["prenet"])
        self.postnet = Decoder(**self.config["postnet"])
        self.decoder = WaveGenerator(**self.config["decoder"])
        self.speaker_encoder = SpeakerEncoder(**self.config["speaker_encoder"])

    # -- features ----------------------------------------------------------

    def get_mel_spectrogram(self, wav: jax.Array) -> jax.Array:
        """ref wav [B, T] -> mel [B, frames, n_mels] — batched, unlike the
        reference's per-sample loop (bicodec.py:227-240)."""
        p = self.mel_params
        return mel_spectrogram(
            wav, sample_rate=p["sample_rate"], n_mels=p["num_mels"],
            n_fft=p["n_fft"], f_min=p["mel_fmin"], f_max=p.get("mel_fmax"),
            hop_length=p["hop_length"], win_length=p["win_length"],
        )

    # -- token api ---------------------------------------------------------

    def tokenize(self, feat: jax.Array, ref_wav: jax.Array):
        """(wav2vec2 feat [B, T, 1024], ref wav [B, S]) ->
        (semantic_tokens [B, T'], global_tokens [B, 32])."""
        return _bicodec_tokenize_jit(self, feat, ref_wav)

    def _tokenize_impl(self, feat: jax.Array, ref_wav: jax.Array):
        mel = self.get_mel_spectrogram(ref_wav)
        z = self.encoder(feat)
        semantic_tokens = self.quantizer.tokenize(z)
        global_tokens = self.speaker_encoder.tokenize(mel)
        return semantic_tokens, global_tokens

    def detokenize(self, semantic_tokens: jax.Array,
                   global_tokens: jax.Array) -> jax.Array:
        """(semantic [B, T], global [B, 32] or [B, 1, 32]) -> wav [B, S]."""
        return _bicodec_detokenize_jit(self, semantic_tokens, global_tokens)

    def _detokenize_impl(self, semantic_tokens: jax.Array,
                         global_tokens: jax.Array) -> jax.Array:
        if global_tokens.ndim == 3:
            global_tokens = global_tokens.reshape(global_tokens.shape[0], -1)
        z_q = self.quantizer.detokenize(semantic_tokens)
        d_vector = self.speaker_encoder.detokenize(global_tokens)
        x = self.prenet(z_q, d_vector)
        x = x + d_vector[:, None, :]
        wav = self.decoder(x)
        return wav[..., 0]

    # -- weights -----------------------------------------------------------

    @staticmethod
    def _is_conv_transpose_key(k: str) -> bool:
        # SamplingBlock upsampler + the WNConvTranspose1d inside each
        # WaveGenerator DecoderBlock (index 1 of its Sequential).
        return "de_conv_upsampler" in k or (
            "decoder.model" in k and ".block.1." in k
        )

    def sanitize(self, weights: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """Torch BiCodec checkpoint -> our NLC naming/layout.

        Torch layouts: conv weight/v [O, I, K], convT weight/v [I, O, K],
        conv g [O, 1, 1], convT g [I, 1, 1] (weight_norm dim=0), snake
        alpha [1, C, 1].  Ours: conv [K, I, O], convT [K, I, O], conv g
        [1, 1, O], convT g [1, I, 1], alpha [C].
        """
        out = {}
        for k, v in weights.items():
            v = np.asarray(v)
            if "num_batches_tracked" in k:
                continue
            # torch wraps the samplers in Sequential(LeakyReLU, conv):
            # de_conv_upsampler.1.* / conv_downsampler.1.* -> drop the index
            k = k.replace("de_conv_upsampler.1.", "de_conv_upsampler.")
            k = k.replace("conv_downsampler.1.", "conv_downsampler.")
            # perceiver FeedForward is a torch Sequential
            # [Linear, GEGLU, Linear] (perceiver_encoder.py:176-198); ours
            # is GEGLUFeedForward(w_in, w_out)
            k = re.sub(r"(perceiver_sampler\.layers\.\d+\.1)\.0\.",
                       r"\1.w_in.", k)
            k = re.sub(r"(perceiver_sampler\.layers\.\d+\.1)\.2\.",
                       r"\1.w_out.", k)
            is_t = self._is_conv_transpose_key(k)
            if k.endswith("weight_g") and v.ndim == 3:
                v = v.transpose((1, 0, 2)) if is_t else v.transpose((1, 2, 0))
            elif k.endswith(("weight_v", "weight")) and v.ndim == 3:
                v = v.transpose((2, 0, 1)) if is_t else v.transpose((2, 1, 0))
            elif k.endswith(".alpha") and v.ndim == 3:
                v = v.reshape(-1)
            out[k] = v
        return out

    # -- training-style forward (reference __call__, bicodec.py:140-183) ---

    def __call__(self, feat: jax.Array, ref_wav: jax.Array) -> Dict[str, Any]:
        mel = self.get_mel_spectrogram(ref_wav)
        z = self.encoder(feat)
        vq = self.quantizer(z)
        x_vector, d_vector = self.speaker_encoder(mel)
        x = self.prenet(vq["z_q"], d_vector)
        pred_feat = self.postnet(x)
        x = x + d_vector[:, None, :]
        wav = self.decoder(x)
        return {
            "recons": wav[..., 0], "pred_feat": pred_feat,
            "x_vector": x_vector, "d_vector": d_vector,
            "indices": vq["indices"],
        }


# jitted entry points (codec as pytree argument; see docs/PERF.md)


@jax.jit
def _bicodec_tokenize_jit(codec, feat, ref_wav):
    return codec._tokenize_impl(feat, ref_wav)


@jax.jit
def _bicodec_detokenize_jit(codec, semantic_tokens, global_tokens):
    return codec._detokenize_impl(semantic_tokens, global_tokens)
