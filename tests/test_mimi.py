"""Mimi codec tests: the reference's shape contracts (codec/tests/
test_mimi.py:9-18) plus batch-vs-streaming equivalence — the property the
reference asserts implicitly through MimiStreamingDecoder."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_audio_tpu.codec.mimi import Mimi, mimi_202407
from mlx_audio_tpu.codec.mimi.seanet import SeanetConfig
from mlx_audio_tpu.codec.mimi.transformer import TransformerConfig
from mlx_audio_tpu.codec.mimi.mimi import MimiConfig


def tiny_mimi(nq=4) -> Mimi:
    """Scaled-down Mimi with the same frame arithmetic (1920 samples/frame)."""
    seanet = SeanetConfig(
        dimension=64, channels=1, causal=True, nfilters=8,
        nresidual_layers=1, ratios=[8, 6, 5, 4], ksize=7, residual_ksize=3,
        last_ksize=3, dilation_base=2, pad_mode="constant", true_skip=True,
        compress=2,
    )
    transformer = TransformerConfig(
        d_model=64, num_heads=4, num_layers=2, causal=True, norm_first=True,
        bias_ff=False, bias_attn=False, layer_scale=0.01,
        positional_embedding="rope", use_conv_bias=True, gating=False,
        norm="layer_norm", context=250, max_period=10000, max_seq_len=8192,
        kv_repeat=1, dim_feedforward=128, conv_layout=True,
    )
    cfg = MimiConfig(
        channels=1, sample_rate=24000, frame_rate=12.5, renormalize=True,
        seanet=seanet, transformer=transformer, quantizer_nq=nq,
        quantizer_bins=64, quantizer_dim=32,
    )
    return Mimi(cfg)


@pytest.fixture(scope="module")
def mimi():
    return tiny_mimi()


def test_encode_decode_shape_contract(mimi):
    """5 s of 24 kHz -> codes (1, nq, 63) -> audio (1, 1, 120960)."""
    pcm = jnp.zeros((1, 1, 120000))
    codes = mimi.encode(pcm)
    assert codes.shape == (1, 4, 63)
    audio = mimi.decode(codes)
    assert audio.shape == (1, 1, 120960)
    assert np.isfinite(np.asarray(audio)).all()


def test_full_mimi_config_shapes():
    cfg = mimi_202407(32)
    assert cfg.quantizer_nq == 32
    assert cfg.quantizer_bins == 2048
    assert cfg.sample_rate == 24000
    assert cfg.frame_rate == 12.5


def test_streaming_decode_matches_batch(mimi):
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 64, size=(1, 4, 6)), dtype=jnp.int32)
    batch_audio = np.asarray(mimi.decode(codes))
    stream_audio = np.asarray(mimi.decode_frames(codes))
    assert stream_audio.shape == batch_audio.shape
    np.testing.assert_allclose(stream_audio, batch_audio, atol=1e-4)


def test_streaming_encode_matches_batch(mimi):
    rng = np.random.default_rng(1)
    frames = 5
    pcm = jnp.asarray(
        rng.standard_normal((1, frames * 1920, 1)) * 0.1, dtype=jnp.float32
    )
    batch_codes = np.asarray(mimi.encode(pcm))

    state = mimi.init_state(1)
    codes = []
    for t in range(frames):
        c, state = mimi.encode_step(state, pcm[:, t * 1920:(t + 1) * 1920])
        codes.append(np.asarray(c))
    stream_codes = np.concatenate(codes, axis=-1)
    assert stream_codes.shape == batch_codes.shape
    match = (stream_codes == batch_codes).mean()
    # argmin ties at float tolerance can differ on rare frames
    assert match > 0.95, f"only {match:.2%} of codes agree"


def test_streaming_roundtrip_state_reuse(mimi):
    """Two sequential decode_step calls must continue the stream (state
    carries), not restart it."""
    rng = np.random.default_rng(2)
    codes = jnp.asarray(rng.integers(0, 64, size=(1, 4, 2)), dtype=jnp.int32)
    state = mimi.init_state(1)
    a1, state = mimi.decode_step(state, codes[..., :1])
    a2, state = mimi.decode_step(state, codes[..., 1:])
    two_step = np.concatenate([np.asarray(a1), np.asarray(a2)], axis=1)[..., 0]
    batch = np.asarray(mimi.decode(codes))[:, 0]
    np.testing.assert_allclose(two_step, batch, atol=1e-4)


def test_rvq_roundtrip_identity():
    """decode(encode(x)) must reproduce codebook entries consistently."""
    from mlx_audio_tpu.codec.mimi.quantization import ResidualVectorQuantization

    rvq = ResidualVectorQuantization(nq=2, dim=16, codebook_size=32)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 7, 16)),
                    dtype=jnp.float32)
    codes = rvq.encode(x)
    assert codes.shape == (2, 2, 7)
    assert (np.asarray(codes) >= 0).all() and (np.asarray(codes) < 32).all()
    out = rvq.decode(codes)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    # decoding must equal the sum of per-stage codebook lookups
    manual = (
        np.asarray(rvq.layers[0].decode(codes[:, 0]))
        + np.asarray(rvq.layers[1].decode(codes[:, 1]))
    )
    np.testing.assert_allclose(np.asarray(out), manual, atol=1e-5)


def test_sanitize_key_mapping():
    from mlx_audio_tpu.codec.mimi.mimi import sanitize_mimi

    w = {
        "encoder.model.0.conv.conv.weight": np.zeros((8, 1, 7)),
        "decoder.model.2.convtr.convtr.weight": np.zeros((128, 64, 16)),
        "encoder.model.1.block.1.conv.conv.weight": np.zeros((4, 8, 3)),
        "downsample.conv.conv.weight": np.zeros((64, 64, 4)),
        "upsample.convtr.convtr.weight": np.zeros((64, 1, 4)),
        "quantizer.rvq_first.input_proj.weight": np.zeros((32, 64, 1)),
        "encoder_transformer.layers.0.self_attn.in_proj_weight": np.zeros((192, 64)),
    }
    out = sanitize_mimi(w)
    assert out["encoder.init_conv1d.weight"].shape == (7, 1, 8)
    assert out["decoder.layers.0.upsample.weight"].shape == (16, 128, 64)
    assert out["encoder.layers.0.residuals.0.block.0.weight"].shape == (3, 8, 4)
    assert out["downsample.weight"].shape == (4, 64, 64)
    assert out["upsample.weight"].shape == (4, 64, 1)
    assert out["quantizer.rvq_first.input_proj.weight"].shape == (32, 64)
    assert "encoder_transformer.layers.0.self_attn.in_proj.weight" in out


def test_streaming_decode_matches_batch_past_window(mimi):
    """Streams longer than the transformer's rotating window must still
    match the batch path exactly — a full ring + 2-token steps previously
    evicted a still-valid key for the step's first query."""
    rng = np.random.default_rng(7)
    ctx = mimi.cfg.transformer.context
    n = ctx * 2 + 7  # decode well past the ring capacity
    codes = jnp.asarray(rng.integers(0, 64, size=(1, 4, n)), dtype=jnp.int32)
    batch_audio = np.asarray(mimi.decode(codes))
    stream_audio = np.asarray(mimi.decode_frames(codes))
    assert stream_audio.shape == batch_audio.shape
    np.testing.assert_allclose(stream_audio, batch_audio, atol=2e-4)


def test_rotating_attention_step_equals_batch_tiny_window():
    """Streaming multi-token steps over a FULL ring must equal the batch
    windowed attention exactly (pre-fix, the step's second write evicted a
    key still inside the first query's window — a 1/context attention-mass
    error invisible at waveform tolerances)."""
    from mlx_audio_tpu.codec.mimi.transformer import (
        Attention,
        TransformerConfig,
    )

    cfg = TransformerConfig(
        d_model=16, num_heads=2, num_layers=1, causal=True, norm_first=True,
        bias_ff=False, bias_attn=False, layer_scale=None,
        positional_embedding="rope", use_conv_bias=True, gating=False,
        norm="layer_norm", context=4, max_period=10000, max_seq_len=8192,
        kv_repeat=1, dim_feedforward=32, conv_layout=True,
    )
    attn = Attention(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 12, 16)) * 0.5, jnp.float32)

    batch = np.asarray(attn(x))
    cache = attn.init_cache(1)
    outs = []
    for i in range(0, 12, 2):  # 2-token steps, ring fills after 2 steps
        o, cache = attn.step(cache, x[:, i:i + 2])
        outs.append(np.asarray(o))
    stream = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(stream, batch, atol=1e-5, rtol=1e-5)
