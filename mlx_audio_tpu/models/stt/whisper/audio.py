"""Whisper audio frontend constants + mel computation.

Parity with /root/reference/mlx_audio/stt/models/whisper/audio.py:12-83,
built on the package DSP core (matmul-DFT STFT on the MXU).
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu import dsp

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH = 30
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE  # 480000
N_FRAMES = N_SAMPLES // HOP_LENGTH      # 3000

N_SAMPLES_PER_TOKEN = HOP_LENGTH * 2
FRAMES_PER_SECOND = SAMPLE_RATE // HOP_LENGTH     # 100
TOKENS_PER_SECOND = SAMPLE_RATE // N_SAMPLES_PER_TOKEN  # 50


def pad_or_trim(array: jax.Array, length: int = N_SAMPLES, *, axis: int = -1):
    if array.shape[axis] > length:
        sl = [slice(None)] * array.ndim
        sl[axis] = slice(0, length)
        array = array[tuple(sl)]
    if array.shape[axis] < length:
        pad = [(0, 0)] * array.ndim
        pad[axis] = (0, length - array.shape[axis])
        array = jnp.pad(array, pad)
    return array


def log_mel_spectrogram(
    audio: Union[np.ndarray, jax.Array],
    n_mels: int = 80,
    padding: int = 0,
) -> jax.Array:
    """[T] 16 kHz waveform -> [frames, n_mels] log-mel (reference
    audio.py:41-82: slaney-norm mel, log10, max-8 floor, /4+1 scale)."""
    audio = jnp.asarray(audio, dtype=jnp.float32)
    if padding > 0:
        audio = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(0, padding)])
    re, im = dsp.stft_realimag(audio, N_FFT, HOP_LENGTH, window="hann_periodic", center=True)
    mag2 = (re * re + im * im)[..., :-1, :]  # drop last frame (ref :74)
    # librosa-style slaney scale + slaney norm (reference passes
    # mel_scale=None which routes to the slaney branch, audio.py:76)
    fb = dsp.mel_filters(SAMPLE_RATE, N_FFT, n_mels, norm="slaney", mel_scale="slaney")
    mel = mag2 @ fb.T
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, log_spec.max() - 8.0)
    return (log_spec + 4.0) / 4.0
