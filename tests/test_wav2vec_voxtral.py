"""Wav2Vec2 + Voxtral tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from mlx_audio_tpu.models.stt.wav2vec import ModelConfig as W2VConfig
from mlx_audio_tpu.models.stt.wav2vec import Wav2Vec2Model
from mlx_audio_tpu.models.stt.voxtral.voxtral import Model as Voxtral
from mlx_audio_tpu.models.stt.voxtral.voxtral import ModelConfig as VoxConfig


def small_w2v(**kw):
    cfg = dict(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, conv_dim=(16, 16, 16), conv_stride=(5, 2, 2),
        conv_kernel=(10, 3, 3), num_feat_extract_layers=3,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
    )
    cfg.update(kw)
    return Wav2Vec2Model(W2VConfig(**cfg))


def test_wav2vec_feature_shapes():
    model = small_w2v()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4000)) * 0.1,
                    dtype=jnp.float32)
    last, feats, _ = model(x)
    # conv stack: strides 5*2*2 = 20, kernels shrink a little
    assert last.shape[0] == 1 and last.shape[2] == 32
    assert feats.shape[:2] == last.shape[:2]
    assert np.isfinite(np.asarray(last)).all()


def test_wav2vec_stable_layer_norm_variant():
    model = small_w2v(do_stable_layer_norm=True, feat_extract_norm="layer")
    x = jnp.zeros((2, 2000))
    last, _, hiddens = model(x, output_hidden_states=True)
    assert last.shape[0] == 2
    assert hiddens is not None and len(hiddens) == 3  # input + 2 layers


class FakeTok:
    def decode(self, ids):
        return " ".join(str(i) for i in ids)


def test_voxtral_transcribe_end_to_end():
    cfg = VoxConfig(
        audio_config=dict(num_mel_bins=80, d_model=32, encoder_layers=2,
                          encoder_attention_heads=4, encoder_ffn_dim=64,
                          intermediate_size=128, max_source_positions=512),
        text_config=dict(vocab_size=128, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, head_dim=8,
                         max_position_embeddings=1024,
                         tie_word_embeddings=True),
        audio_token_id=24,
    )
    model = Voxtral(cfg, tokenizer=FakeTok())
    audio = np.random.default_rng(1).standard_normal(16000).astype(np.float32) * 0.1
    out = model.generate(audio, max_tokens=12, temperature=0.0,
                         eos_token_ids=(2,))
    assert isinstance(out.text, str)
    assert out.language == "en"


def test_voxtral_int4_quantized_transcribe():
    """Weight-only int4 (packed codes) through the full Voxtral product
    path — the capacity configuration bench_voxtral.py --quant int4
    measures on chip (docs/PERF.md quantization verdict)."""
    import jax

    from mlx_audio_tpu.nn.quantize import QuantizedLinear, quantize_model

    cfg = VoxConfig(
        audio_config=dict(num_mel_bins=80, d_model=32, encoder_layers=2,
                          encoder_attention_heads=4, encoder_ffn_dim=64,
                          intermediate_size=128, max_source_positions=512),
        text_config=dict(vocab_size=128, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, head_dim=8,
                         max_position_embeddings=1024,
                         tie_word_embeddings=True),
        audio_token_id=24,
    )
    model = Voxtral(cfg, tokenizer=FakeTok())
    quantize_model(model, group_size=16, bits=4)
    qlin = [m for m in jax.tree_util.tree_leaves(
        model, is_leaf=lambda x: isinstance(x, QuantizedLinear))
        if isinstance(m, QuantizedLinear)]
    assert qlin and all(q.packed for q in qlin)
    audio = np.random.default_rng(1).standard_normal(16000).astype(np.float32) * 0.1
    out = model.generate(audio, max_tokens=8, temperature=0.0,
                         eos_token_ids=(2,))
    assert isinstance(out.text, str)


def test_voxtral_audio_embed_splice():
    cfg = VoxConfig(
        audio_config=dict(num_mel_bins=80, d_model=32, encoder_layers=1,
                          encoder_attention_heads=4, encoder_ffn_dim=64,
                          intermediate_size=64, max_source_positions=256),
        text_config=dict(vocab_size=64, hidden_size=16, intermediate_size=32,
                         num_hidden_layers=1, num_attention_heads=2,
                         num_key_value_heads=2, head_dim=8,
                         tie_word_embeddings=True),
        audio_token_id=5,
    )
    model = Voxtral(cfg)
    mel = jnp.zeros((1, 100, 80))
    n_audio = (100 // 2) // (64 // 32)
    ids = jnp.asarray([[1] + [5] * n_audio + [2]])
    embeds = model.merge_input_embeddings(ids, mel[0][None])
    assert embeds.shape == (1, n_audio + 2, 16)
    # non-audio positions keep the text embedding
    text_emb = np.asarray(model.language_model.embed_tokens(jnp.asarray([1])))
    np.testing.assert_allclose(np.asarray(embeds[0, 0]), text_emb[0], atol=1e-5)


def test_feature_extractor_padding_and_mask():
    """HF-compatible preprocessing: pad/truncate/normalize/attention-mask
    (reference wav2vec feature_extractor.py:90)."""
    from mlx_audio_tpu.models.stt.wav2vec import Wav2Vec2FeatureExtractor

    fe = Wav2Vec2FeatureExtractor(do_normalize=True,
                                  return_attention_mask=True)
    rng = np.random.default_rng(0)
    a = rng.standard_normal(1000).astype(np.float32) * 3 + 1
    b = rng.standard_normal(600).astype(np.float32)

    out = fe([a, b], padding=True)
    assert out.input_values.shape == (2, 1000)
    assert out.attention_mask.shape == (2, 1000)
    assert out.attention_mask[1, 600:].sum() == 0
    # normalization over the VALID region only
    assert abs(out.input_values[0].mean()) < 1e-5
    valid = out.input_values[1][:600]
    assert abs(valid.mean()) < 1e-5 and abs(valid.std() - 1) < 1e-3
    # padded region holds the padding value
    assert np.all(out.input_values[1, 600:] == 0.0)

    out2 = fe(a, padding="max_length", max_length=1200, truncation=True)
    assert out2.input_values.shape == (1, 1200)
    out3 = fe([a], padding="max_length", max_length=512, truncation=True)
    assert out3.input_values.shape == (1, 512)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        fe([a, b])  # ragged without padding
    with _pytest.raises(ValueError):
        fe(a, sampling_rate=8000)


def test_feature_extractor_2d_batch_and_overflow():
    from mlx_audio_tpu.models.stt.wav2vec import Wav2Vec2FeatureExtractor

    fe = Wav2Vec2FeatureExtractor(do_normalize=False)
    batch2d = np.random.default_rng(1).standard_normal((4, 320)).astype(
        np.float32)
    out = fe(batch2d, padding=True)
    assert out.input_values.shape == (4, 320)
    np.testing.assert_array_equal(out.input_values, batch2d)

    # padding='max_length' with a longer input and no truncation must not
    # crash: the batch pads out to the longest instead
    long = np.zeros(500, dtype=np.float32)
    out2 = fe([long, np.zeros(100, dtype=np.float32)],
              padding="max_length", max_length=320)
    assert out2.input_values.shape == (2, 500)


def test_voxtral_long_audio_windows():
    """Audio longer than one encoder window is transcribed per window and
    concatenated (not silently truncated to the first 30 s equivalent)."""
    cfg = VoxConfig(
        audio_config=dict(num_mel_bins=80, d_model=32, encoder_layers=2,
                          encoder_attention_heads=4, encoder_ffn_dim=64,
                          intermediate_size=128, max_source_positions=64),
        text_config=dict(vocab_size=128, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, head_dim=8,
                         max_position_embeddings=1024,
                         tie_word_embeddings=True),
        audio_token_id=24,
    )
    model = Voxtral(cfg, tokenizer=FakeTok())
    # window = 2*64 mel frames = 1.28 s; 4 s of audio => 4 windows
    audio = np.random.default_rng(2).standard_normal(4 * 16000).astype(np.float32) * 0.1
    out = model.generate(audio, max_tokens=6, temperature=0.0,
                         eos_token_ids=(2,))
    assert len(out.segments) >= 3
    assert isinstance(out.text, str)


def test_voxtral_generate_accepts_file_path(tmp_path):
    """The STT CLI/server pass audio file PATHS; Voxtral must load them
    like Whisper/Parakeet do."""
    from mlx_audio_tpu.utils.audio_io import save_audio

    cfg = VoxConfig(
        audio_config=dict(num_mel_bins=80, d_model=32, encoder_layers=1,
                          encoder_attention_heads=4, encoder_ffn_dim=64,
                          intermediate_size=128, max_source_positions=64),
        text_config=dict(vocab_size=128, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=1, num_attention_heads=4,
                         num_key_value_heads=2, head_dim=8,
                         max_position_embeddings=1024,
                         tie_word_embeddings=True),
        audio_token_id=24,
    )
    model = Voxtral(cfg, tokenizer=FakeTok())
    wav = tmp_path / "x.wav"
    save_audio(str(wav),
               np.random.default_rng(0).standard_normal(16000).astype(
                   np.float32) * 0.1, 16000)
    out = model.generate(str(wav), max_tokens=4, temperature=0.0)
    assert isinstance(out.text, str)
