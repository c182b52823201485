"""Spark-TTS: BiCodec blocks, FSQ, speaker encoder, prompts, e2e generate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_tpu.models.tts.spark.bicodec import (
    BiCodec,
    Decoder,
    Encoder,
    WaveGenerator,
    mel_spectrogram,
)
from mlx_audio_tpu.models.tts.spark.modules import (
    ECAPA_TDNN,
    FSQ,
    FactorizedVectorQuantize,
    PerceiverResampler,
    ResidualFSQ,
    SamplingBlock,
    SpeakerEncoder,
)
from mlx_audio_tpu.models.tts.spark.token_parser import (
    build_clone_prompt,
    build_control_prompt,
    parse_generated_tokens,
)

TINY_BICODEC = {
    "mel_params": {
        "sample_rate": 16000, "n_fft": 64, "win_length": 32, "hop_length": 16,
        "mel_fmin": 10, "mel_fmax": None, "num_mels": 16,
    },
    "encoder": {
        "input_channels": 8, "vocos_dim": 16, "vocos_intermediate_dim": 32,
        "vocos_num_layers": 1, "out_channels": 16, "sample_ratios": [2, 2],
    },
    "decoder": {
        "input_channel": 16, "channels": 32, "rates": [2, 2],
        "kernel_sizes": [4, 4],
    },
    "quantizer": {"input_dim": 16, "codebook_size": 32, "codebook_dim": 4},
    "speaker_encoder": {
        "input_dim": 16, "out_dim": 16, "latent_dim": 8, "token_num": 4,
        "fsq_levels": [4, 4], "fsq_num_quantizers": 1,
    },
    "prenet": {
        "input_channels": 16, "vocos_dim": 16, "vocos_intermediate_dim": 32,
        "vocos_num_layers": 1, "out_channels": 16, "condition_dim": 16,
        "sample_ratios": [2, 2],
    },
    "postnet": {
        "input_channels": 16, "vocos_dim": 16, "vocos_intermediate_dim": 32,
        "vocos_num_layers": 1, "out_channels": 8, "sample_ratios": [1, 1],
    },
}


def test_sampling_block_shapes():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 12, 16)),
                    dtype=jnp.float32)
    up = SamplingBlock(dim=16, groups=16, upsample_scale=2)
    assert up(x).shape == (2, 24, 16)
    down = SamplingBlock(dim=16, groups=16, downsample_scale=2)
    assert down(x).shape == (2, 6, 16)
    # identity config triples the input (reference sampler.py:83-93 sums
    # conv_res + skip1 + skip2 = 3x when both scales are 1)
    ident = SamplingBlock(dim=16, groups=16)
    np.testing.assert_allclose(np.asarray(ident(x)), 3 * np.asarray(x),
                               rtol=1e-6)


def test_fsq_roundtrip():
    fsq = FSQ(levels=[4, 4, 4])
    z = jnp.asarray(np.random.default_rng(1).standard_normal((2, 6, 3)) * 2,
                    dtype=jnp.float32)
    codes, idx = fsq(z)
    assert idx.shape == (2, 6) and int(idx.max()) < fsq.codebook_size
    rec = fsq.indices_to_codes(idx)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(codes), atol=1e-6)


def test_residual_fsq_output_from_indices():
    rfsq = ResidualFSQ(levels=[4, 4], num_quantizers=2)
    z = jnp.asarray(np.random.default_rng(2).standard_normal((2, 5, 2)),
                    dtype=jnp.float32)
    q, idx = rfsq(z)
    rec = rfsq.get_output_from_indices(idx)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(q), atol=1e-5)


def test_factorized_vq_token_roundtrip():
    vq = FactorizedVectorQuantize(input_dim=16, codebook_size=32, codebook_dim=4)
    z = jnp.asarray(np.random.default_rng(3).standard_normal((2, 7, 16)),
                    dtype=jnp.float32)
    idx = vq.tokenize(z)
    assert idx.shape == (2, 7) and int(idx.max()) < 32
    out = vq.detokenize(idx)
    assert out.shape == (2, 7, 16)
    # detokenize must agree with the full forward's z_q
    full = vq(z)
    np.testing.assert_allclose(np.asarray(out), np.asarray(full["z_q"]),
                               atol=1e-6)
    assert np.array_equal(np.asarray(idx), np.asarray(full["indices"]))


def test_speaker_encoder_tokenize_detokenize():
    spk = SpeakerEncoder(input_dim=16, out_dim=16, latent_dim=8, token_num=4,
                         fsq_levels=[4, 4])
    mel = jnp.asarray(np.random.default_rng(4).standard_normal((2, 40, 16)),
                      dtype=jnp.float32)
    tokens = spk.tokenize(mel)
    assert tokens.shape == (2, 4)
    d = spk.detokenize(tokens)
    assert d.shape == (2, 16)
    x_vec, d_vec = spk(mel)
    assert x_vec.shape == (2, 16)
    # quantized path: detokenize(tokenize(mel)) == d_vector from forward
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_vec), atol=1e-5)


def test_encoder_decoder_shapes():
    enc = Encoder(**TINY_BICODEC["encoder"])
    x = jnp.asarray(np.random.default_rng(5).standard_normal((2, 20, 8)),
                    dtype=jnp.float32)
    z = enc(x)
    assert z.shape == (2, 5, 16)  # two /2 downsamples
    dec = Decoder(**TINY_BICODEC["prenet"])
    c = jnp.asarray(np.random.default_rng(6).standard_normal((2, 16)),
                    dtype=jnp.float32)
    y = dec(z, c)
    assert y.shape == (2, 20, 16)  # two x2 upsamples


def test_wave_generator_upsamples():
    wg = WaveGenerator(**TINY_BICODEC["decoder"])
    x = jnp.asarray(np.random.default_rng(7).standard_normal((2, 10, 16)),
                    dtype=jnp.float32)
    wav = wg(x)
    assert wav.shape == (2, 40, 1)
    assert float(jnp.abs(wav).max()) <= 1.0  # tanh output


def test_bicodec_token_roundtrip_shapes():
    codec = BiCodec(TINY_BICODEC)
    feat = jnp.asarray(np.random.default_rng(8).standard_normal((1, 20, 8)),
                       dtype=jnp.float32)
    ref_wav = jnp.asarray(
        np.random.default_rng(9).standard_normal((1, 1600)) * 0.1,
        dtype=jnp.float32)
    semantic, global_ = codec.tokenize(feat, ref_wav)
    assert semantic.shape == (1, 5)
    assert global_.shape == (1, 4)
    wav = codec.detokenize(semantic, global_)
    # 5 tokens -> x4 feature upsample -> x4 wave upsample
    assert wav.shape == (1, 80)
    # [B, 1, T] global tokens accepted too (reference audio_tokenizer.py:134)
    wav2 = codec.detokenize(semantic, global_[:, None, :])
    np.testing.assert_allclose(np.asarray(wav2), np.asarray(wav), atol=1e-6)


def test_mel_spectrogram_shape():
    wav = jnp.asarray(np.random.default_rng(10).standard_normal((2, 1600)),
                      dtype=jnp.float32)
    mel = mel_spectrogram(wav, n_mels=16, n_fft=64, hop_length=16,
                          win_length=32)
    assert mel.shape[0] == 2 and mel.shape[2] == 16
    assert mel.shape[1] == 1600 // 16 + 1  # centered frames


def test_prompt_builders():
    p = build_control_prompt("hi there", "female", pitch="high", speed="low")
    assert "<|task_controllable_tts|>" in p
    assert "<|gender_0|>" in p and "<|pitch_label_3|>" in p
    assert "<|speed_label_1|>" in p

    p2 = build_clone_prompt("hello", "ref text", [1, 2], [3, 4, 5])
    assert "<|task_tts|>" in p2
    assert "<|bicodec_global_1|><|bicodec_global_2|>" in p2
    assert "<|bicodec_semantic_5|>" in p2
    # without a transcript there is no semantic prefix
    p3 = build_clone_prompt("hello", None, [1], [3])
    assert "semantic" not in p3.replace("<|start_semantic_token|>", "KEEP")


def test_parse_generated_tokens():
    text = ("<|bicodec_semantic_5|><|bicodec_semantic_12|>"
            "<|bicodec_global_7|>junk<|bicodec_semantic_1|>")
    semantic, global_ = parse_generated_tokens(text)
    assert semantic == [5, 12, 1]
    assert global_ == [7]


class _FakeTokenizer:
    """Maps our special tokens to stable ids and back (vocab-free)."""

    def __init__(self):
        self.vocab = {}

    def _id(self, tok):
        return self.vocab.setdefault(tok, 10 + len(self.vocab))

    def __call__(self, text, return_tensors=None):
        ids = np.asarray([[self._id(c) for c in text[:48]]], dtype=np.int32)

        class R:
            input_ids = ids

        return R()

    def decode(self, ids, skip_special_tokens=False):
        # pretend the LM emitted 6 semantic tokens + 4 global tokens
        sem = "".join(f"<|bicodec_semantic_{i % 32}|>" for i in ids[:6])
        glo = "".join(f"<|bicodec_global_{i % 16}|>" for i in ids[:4])
        return sem + glo


def test_spark_model_generate_control():
    from mlx_audio_tpu.models.tts.spark.spark import Model, ModelConfig

    cfg = ModelConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
        max_position_embeddings=512,
    )
    model = Model(cfg, bicodec=BiCodec(TINY_BICODEC),
                  tokenizer=_FakeTokenizer())
    results = list(model.generate(
        "hello world", gender="female", temperature=0.0, max_tokens=8,
    ))
    assert len(results) == 1
    r = results[0]
    assert r.sample_rate == 16000
    assert r.audio.ndim == 1 and r.audio.size > 0
    # 6 semantic tokens -> x4 decoder upsample -> x4 wave upsample
    assert r.audio.size == 6 * 4 * 4


def test_spark_sanitize_routes_prefixes():
    from mlx_audio_tpu.models.tts.spark.spark import Model, ModelConfig

    cfg = ModelConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=1,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=64,
    )
    model = Model(cfg, bicodec=BiCodec(TINY_BICODEC),
                  tokenizer=_FakeTokenizer())
    weights = {
        "model.layers.0.self_attn.q_proj.weight": np.zeros((32, 32)),
        "quantizer.codebook.weight": np.zeros((32, 4)),
        "encoder.project.weight": np.zeros((16, 16)),
        # torch conv [O, I, K] -> ours [K, I, O]
        "encoder.encoder.embed.weight": np.zeros((16, 8, 7)),
        # depthwise convT in a SamplingBlock, torch Sequential index
        "prenet.downsample.0.0.de_conv_upsampler.1.weight_g":
            np.zeros((16, 1, 1)),
    }
    out = model.sanitize(weights)
    assert "lm.model.layers.0.self_attn.q_proj.weight" in out
    assert "bicodec.quantizer.codebook.weight" in out
    assert out["bicodec.encoder.encoder.embed.weight"].shape == (7, 8, 16)
    assert (
        out["bicodec.prenet.downsample.0.0.de_conv_upsampler.weight_g"].shape
        == (1, 16, 1)
    )


def test_spark_generate_batch_control():
    from mlx_audio_tpu.models.tts.spark.spark import Model, ModelConfig

    cfg = ModelConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
        max_position_embeddings=512,
    )
    model = Model(cfg, bicodec=BiCodec(TINY_BICODEC),
                  tokenizer=_FakeTokenizer())
    results = model.generate_batch(
        ["hello world", "a second longer sentence"], gender="female",
        temperature=0.0, max_tokens=8,
    )
    assert len(results) == 2
    for r in results:
        assert r.sample_rate == 16000
        assert r.audio.ndim == 1 and r.audio.size > 0
        assert np.isfinite(r.audio).all()


def test_bicodec_sanitize_maps_perceiver_feedforward_keys():
    """Torch BiCodec checkpoints store the perceiver FF as a Sequential
    [Linear, GEGLU, Linear] (reference perceiver_encoder.py:176-198);
    sanitize must rename .1.0/.1.2 onto our GEGLUFeedForward w_in/w_out —
    update_arrays(strict=False) would otherwise silently drop them."""
    import numpy as np

    from mlx_audio_tpu.models.tts.spark.bicodec import BiCodec

    b = BiCodec.__new__(BiCodec)
    w = {
        "speaker_encoder.perceiver_sampler.layers.0.1.0.weight": np.zeros((6, 4)),
        "speaker_encoder.perceiver_sampler.layers.0.1.0.bias": np.zeros((6,)),
        "speaker_encoder.perceiver_sampler.layers.0.1.2.weight": np.zeros((4, 3)),
        "speaker_encoder.perceiver_sampler.layers.0.1.2.bias": np.zeros((4,)),
        "speaker_encoder.perceiver_sampler.layers.0.0.to_q.weight": np.zeros((8, 4)),
    }
    out = b.sanitize(w)
    assert "speaker_encoder.perceiver_sampler.layers.0.1.w_in.weight" in out
    assert "speaker_encoder.perceiver_sampler.layers.0.1.w_in.bias" in out
    assert "speaker_encoder.perceiver_sampler.layers.0.1.w_out.weight" in out
    assert "speaker_encoder.perceiver_sampler.layers.0.1.w_out.bias" in out
    # these names exist in the module pytree
    from mlx_audio_tpu.models.tts.spark.modules import PerceiverResampler
    from mlx_audio_tpu.nn.module import named_arrays

    m = PerceiverResampler(dim=8, depth=1, dim_context=8, num_latents=2,
                           dim_head=4, heads=2, ff_mult=2)
    paths = {k for k, _ in named_arrays(m)}
    assert "layers.0.1.w_in.weight" in paths and "layers.0.1.w_out.weight" in paths
