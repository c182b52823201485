"""EnCodec shape contracts (reference codec/tests/test_encodec.py:37-54:
120k samples -> (1,1,2,375) codes @ default bw, (1,1,8,375) @ 6kbps,
exact-length reconstruction)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mlx_audio_tpu.codec.encodec import Encodec, EncodecConfig, preprocess_audio


def small_encodec(**kw):
    cfg = dict(
        audio_channels=1,
        num_filters=8,
        kernel_size=7,
        num_residual_layers=1,
        dilation_growth_rate=2,
        codebook_size=1024,
        codebook_dim=32,
        hidden_size=32,
        num_lstm_layers=2,
        residual_kernel_size=3,
        use_causal_conv=True,
        normalize=False,
        pad_mode="reflect",
        norm_type="weight_norm",
        last_kernel_size=7,
        trim_right_ratio=1.0,
        compress=2,
        upsampling_ratios=[8, 5, 4, 2],
        target_bandwidths=[1.5, 3.0, 6.0, 12.0, 24.0],
        sampling_rate=24000,
    )
    cfg.update(kw)
    return Encodec(EncodecConfig(**cfg))


@pytest.fixture(scope="module")
def model():
    return small_encodec()


def test_default_bandwidth_codes(model):
    audio, mask = preprocess_audio(np.zeros(120_000, dtype=np.float32))
    codes, scales = model.encode(audio, mask)
    assert codes.shape == (1, 1, 2, 375)
    assert scales == [None]


def test_6kbps_codes(model):
    audio, mask = preprocess_audio(np.zeros(120_000, dtype=np.float32))
    codes, scales = model.encode(audio, mask, bandwidth=6.0)
    assert codes.shape == (1, 1, 8, 375)


def test_exact_length_reconstruction(model):
    audio, mask = preprocess_audio(np.zeros(120_000, dtype=np.float32))
    codes, scales = model.encode(audio, mask)
    out = model.decode(codes, scales, mask)
    assert out.shape == (1, 120_000, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_unsupported_bandwidth_raises(model):
    audio, mask = preprocess_audio(np.zeros(32_000, dtype=np.float32))
    with pytest.raises(ValueError):
        model.encode(audio, mask, bandwidth=7.5)


def test_chunked_normalized_model():
    model = small_encodec(normalize=True, chunk_length_s=1.0, overlap=0.01,
                          sampling_rate=24000)
    x = np.random.default_rng(0).standard_normal(50_000).astype(np.float32) * 0.1
    audio, mask = preprocess_audio(
        x, 24000, model.chunk_length, model.chunk_stride
    )
    codes, scales = model.encode(audio, mask)
    assert codes.shape[0] > 1  # multiple chunks
    assert all(s is not None for s in scales)
    out = model.decode(codes, scales, mask)
    assert out.shape[1] == mask.shape[1]
    assert np.isfinite(np.asarray(out)).all()
