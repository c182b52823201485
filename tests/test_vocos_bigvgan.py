"""Vocos + BigVGAN shape contracts (reference codec/tests/test_vocos.py,
test_bigvgan.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mlx_audio_tpu.codec.bigvgan import BigVGAN, BigVGANConfig
from mlx_audio_tpu.codec.vocos import (
    ISTFTHead,
    MelSpectrogramFeatures,
    Vocos,
    VocosBackbone,
)


def small_vocos():
    return Vocos(
        feature_extractor=MelSpectrogramFeatures(
            sample_rate=24000, n_fft=1024, hop_length=256, n_mels=100
        ),
        backbone=VocosBackbone(
            input_channels=100, dim=64, intermediate_dim=128, num_layers=2
        ),
        head=ISTFTHead(dim=64, n_fft=1024, hop_length=256),
    )


def test_vocos_mel_roundtrip_contract():
    """Reference contract: 120k samples -> 119,552 reconstructed
    (n_fft 1024 / hop 256; codec/tests/test_vocos.py:61-73)."""
    model = small_vocos()
    audio = jnp.zeros((1, 120_000))
    out = model(audio)
    assert out.shape == (1, 119_552)
    assert np.isfinite(np.asarray(out)).all()


def test_vocos_decode_features():
    model = small_vocos()
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 50, 100)) * 0.1,
        dtype=jnp.float32,
    )
    audio = model.decode(feats)
    assert audio.shape == (1, (50 - 1) * 256 + 1024 - 1024)
    assert np.isfinite(np.asarray(audio)).all()


def test_vocos_mel_features_shape():
    fe = MelSpectrogramFeatures(n_mels=100)
    mel = fe(jnp.zeros((1, 24000)))
    assert mel.shape[0] == 1 and mel.shape[-1] == 100


def small_bigvgan(resblock="1", activation="snakebeta"):
    return BigVGAN(BigVGANConfig(
        num_mels=20,
        upsample_rates=[4, 2],
        upsample_kernel_sizes=[8, 4],
        upsample_initial_channel=32,
        resblock=resblock,
        resblock_kernel_sizes=[3, 5],
        resblock_dilation_sizes=[[1, 3], [1, 3]],
        activation=activation,
        snake_logscale=True,
    ))


@pytest.mark.parametrize("resblock,act", [("1", "snakebeta"), ("2", "snake")])
def test_bigvgan_upsampling_contract(resblock, act):
    model = small_bigvgan(resblock, act)
    mel = jnp.zeros((1, 20, 16))  # [B, num_mels, T] NCL contract
    out = model(mel)
    # total upsampling 4*2 = 8x
    assert out.shape == (1, 16 * 8, 1)
    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(out)).max() <= 1.0


def test_kaiser_filter_dc_gain():
    from mlx_audio_tpu.codec.bigvgan.bigvgan import kaiser_sinc_filter1d

    f = kaiser_sinc_filter1d(0.25, 0.3, 12)
    np.testing.assert_allclose(f.sum(), 1.0, atol=1e-6)


def test_antialiased_activation_preserves_length():
    from mlx_audio_tpu.codec.bigvgan.bigvgan import Activation1d, SnakeAct

    act = Activation1d(SnakeAct(8))
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 40, 8)),
                    dtype=jnp.float32)
    y = act(x)
    assert y.shape == x.shape
