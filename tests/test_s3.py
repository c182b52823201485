"""S3 tokenizer tests (reference codec/tests/test_s3.py contract: mel in,
token codes + lengths out at the 25/50 Hz rates)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mlx_audio_tpu.codec.s3 import S3Config, S3Tokenizer, S3TokenizerV2, log_mel_spectrogram


def small_cfg():
    return S3Config(n_mels=128, n_audio_ctx=1500, n_audio_state=64,
                    n_audio_head=4, n_audio_layer=2, n_codebook_size=128)


def test_log_mel_shape():
    mel = np.asarray(log_mel_spectrogram(np.zeros(16000, dtype=np.float32)))
    assert mel.shape[0] == 128
    assert np.isfinite(mel).all()


def test_v1_quantize_50hz():
    model = S3Tokenizer("speech_tokenizer_v1", small_cfg())
    mel = jnp.zeros((1, 128, 200))
    codes, lens = model(mel, jnp.asarray([200]))
    # stride 1 conv then stride 2: 200 -> 200 -> 100
    assert codes.shape == (1, 100)
    assert int(lens[0]) == 100
    assert (np.asarray(codes) >= 0).all() and (np.asarray(codes) < 128).all()


def test_v1_quantize_25hz():
    model = S3Tokenizer("speech_tokenizer_v1_25hz", small_cfg())
    mel = jnp.zeros((1, 128, 200))
    codes, lens = model(mel, jnp.asarray([200]))
    assert codes.shape == (1, 50)
    assert int(lens[0]) == 50


def test_v2_fsq_range():
    model = S3TokenizerV2("speech_tokenizer_v2_25hz", small_cfg())
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 128, 100)) * 0.1,
        dtype=jnp.float32,
    )
    codes, lens = model(mel, jnp.asarray([100]))
    assert codes.shape == (1, 25)
    c = np.asarray(codes)
    assert (c >= 0).all() and (c < 3 ** 8).all()


def test_padded_batch_lengths():
    model = S3Tokenizer("speech_tokenizer_v1", small_cfg())
    mel = jnp.zeros((2, 128, 200))
    codes, lens = model(mel, jnp.asarray([200, 120]))
    assert codes.shape == (2, 100)
    assert int(lens[0]) == 100 and int(lens[1]) == 60
