"""Speaker-conditioned BigVGAN head for IndexTTS.

Capability parity with /root/reference/mlx_audio/tts/models/indextts/
bigvgan.py:12-124 and mel.py:6-37: the GPT latent stream replaces the mel
input of the shared BigVGAN (codec/bigvgan), and an ECAPA d-vector from
the reference mel is injected pre-stack and after every upsampling stage.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from mlx_audio_tpu import dsp
from mlx_audio_tpu.codec.bigvgan.bigvgan import BigVGAN, BigVGANConfig
from mlx_audio_tpu.nn import Conv1d, WNConv1d

from .ecapa import ECPATDNN, ECPATDNNArgs


@dataclass
class BigVGANConditioningConfig(BigVGANConfig):
    gpt_dim: int = 1
    speaker_embedding_dim: int = 1
    cond_d_vector_in_each_upsampling_layer: bool = True


def log_mel_spectrogram(audio: jax.Array, sample_rate: int = 24_000,
                        n_mels: int = 100, n_fft: int = 1024,
                        hop_length: int = 256) -> jax.Array:
    """audio [T] or [B, T] -> log-mel [B, frames, n_mels] (mel.py:6-37:
    htk mels, no norm, log floor 1e-5)."""
    audio = jnp.atleast_2d(audio)
    re, im = dsp.stft_realimag(audio, n_fft=n_fft, hop_length=hop_length,
                               win_length=n_fft, window="hann_periodic",
                               center=True)  # torch.hann_window-trained
    mag = jnp.sqrt(re * re + im * im + 1e-12)  # [B, frames, bins]
    filters = dsp.mel_filters(sample_rate, n_fft, n_mels, norm=None,
                              mel_scale="htk")
    mel = jnp.einsum("btf,mf->btm", mag, filters)
    return jnp.log(jnp.maximum(mel, 1e-5))


class BigVGANConditioning(BigVGAN):
    def __init__(self, config):
        if isinstance(config, dict):
            config = BigVGANConditioningConfig.from_dict(config)
        super().__init__(config)
        ch0 = config.upsample_initial_channel
        self.conv_pre = WNConv1d(config.gpt_dim, ch0, 7, 1, 3)
        self.cond_in_each_up_layer = (
            config.cond_d_vector_in_each_upsampling_layer
        )
        self.speaker_encoder = ECPATDNN(ECPATDNNArgs(
            config.num_mels, lin_neurons=config.speaker_embedding_dim,
        ))
        self.cond_layer = Conv1d(config.speaker_embedding_dim, ch0, 1)
        self.conds = (
            [Conv1d(config.speaker_embedding_dim, ch0 // (2 ** (i + 1)), 1)
             for i in range(len(self.ups))]
            if self.cond_in_each_up_layer else []
        )

    def __call__(self, latents: jax.Array, mel_refer: jax.Array) -> jax.Array:
        """(GPT latents [B, T, gpt_dim], ref mel [B, Tr, num_mels]) ->
        audio [B, samples] (reference bigvgan.py:48-80)."""
        return _vocoder_forward_jit(self, latents, mel_refer)

    def _forward_impl(self, latents: jax.Array, mel_refer: jax.Array) -> jax.Array:
        speaker_embedding = self.speaker_encoder(mel_refer)  # [B, 1, spk]
        x = self.conv_pre(latents) + self.cond_layer(speaker_embedding)
        for step in range(self.num_upsamples):
            for up in self.ups[step]:
                x = up(x)
            if self.cond_in_each_up_layer:
                x = x + self.conds[step](speaker_embedding)
            xs = self.resblocks[step * self.num_kernels](x)
            for idx in range(1, self.num_kernels):
                xs = xs + self.resblocks[step * self.num_kernels + idx](x)
            x = xs / self.num_kernels
        x = self.activation_post(x)
        x = self.conv_post(x)
        if self.use_tanh_at_final:
            x = jnp.tanh(x)
        else:
            x = jnp.clip(x, -1.0, 1.0)
        return x[..., 0]


# jitted entry point (model as pytree argument; see docs/PERF.md)
import jax as _jax


@_jax.jit
def _vocoder_forward_jit(model, latents, mel_refer):
    return model._forward_impl(latents, mel_refer)
