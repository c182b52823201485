"""Parakeet/NeMo mel frontend (reference stt/models/parakeet/audio.py)."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from mlx_audio_tpu import dsp


@dataclass
class PreprocessArgs:
    sample_rate: int
    normalize: str
    window_size: float
    window_stride: float
    window: str
    features: int
    n_fft: int
    dither: float = 0.0
    pad_to: int = 0
    pad_value: float = 0

    @property
    def win_length(self) -> int:
        return int(self.window_size * self.sample_rate)

    @property
    def hop_length(self) -> int:
        return int(self.window_stride * self.sample_rate)

    @classmethod
    def from_dict(cls, d: dict) -> "PreprocessArgs":
        return cls(**{k: v for k, v in d.items() if k in cls.__dataclass_fields__})


def log_mel_spectrogram(x: jax.Array, args: PreprocessArgs) -> jax.Array:
    """[T] waveform -> [1, frames, features] normalized log-mel."""
    x = jnp.asarray(x, dtype=jnp.float32)
    if args.pad_to > 0 and x.shape[-1] < args.pad_to:
        x = jnp.pad(x, (0, args.pad_to - x.shape[-1]),
                    constant_values=args.pad_value)
    # NeMo's FilterbankFeatures builds its window with periodic=False
    # (symmetric) — unlike Whisper/torchaudio frontends, the plain
    # symmetric "hann" is the checkpoint-faithful choice here
    re, im = dsp.stft_realimag(
        x, args.n_fft, args.hop_length, args.win_length, args.window,
        center=True,
    )
    power = re * re + im * im  # [frames, bins]
    fb = dsp.mel_filters(
        args.sample_rate, args.n_fft, args.features,
        norm=args.normalize if args.normalize == "slaney" else None,
        mel_scale="slaney",
    )
    mel = power @ fb.T  # [frames, features]
    mel = jnp.log(mel + 1e-5)
    if args.normalize == "per_feature":
        mean = jnp.mean(mel, axis=0, keepdims=True)
        std = jnp.std(mel, axis=0, keepdims=True)
        mel = (mel - mean) / (std + 1e-5)
    else:
        mel = (mel - jnp.mean(mel)) / (jnp.std(mel) + 1e-5)
    return mel[None]
