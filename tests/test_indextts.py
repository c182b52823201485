"""IndexTTS: normalization, conformer/perceiver/ecapa, GPT cache, e2e."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_tpu.models.tts.indextts import normalize
from mlx_audio_tpu.models.tts.indextts.conformer import Conformer, ConformerArgs
from mlx_audio_tpu.models.tts.indextts.ecapa import ECPATDNN, ECPATDNNArgs
from mlx_audio_tpu.models.tts.indextts.gpt import GPT2Args, GPT2Model
from mlx_audio_tpu.models.tts.indextts.indextts import (
    GPTConfig,
    Model,
    ModelConfig,
)
from mlx_audio_tpu.models.tts.indextts.perceiver import PerceiverResampler
from mlx_audio_tpu.models.tts.indextts.vocoder import (
    BigVGANConditioningConfig,
    log_mel_spectrogram,
)

TINY_CONFORMER = ConformerArgs(
    input_size=16, output_size=32, num_blocks=1, linear_units=64,
    attention_heads=4, input_layer="conv2d2", cnn_module_kernel=7,
    pos_emb_max_len=64, perceiver_mult=2,
)


def tiny_model_config() -> ModelConfig:
    return ModelConfig(
        bigvgan=BigVGANConditioningConfig(
            num_mels=16, upsample_rates=[2, 2], upsample_kernel_sizes=[4, 4],
            upsample_initial_channel=32, resblock="1",
            resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 3, 5]],
            activation="snakebeta", snake_logscale=True,
            use_tanh_at_final=False, gpt_dim=32, speaker_embedding_dim=16,
        ),
        gpt=GPTConfig(
            model_dim=32, heads=4, layers=2, max_mel_tokens=100,
            max_text_tokens=50, number_text_tokens=40, number_mel_codes=30,
            start_mel_token=28, stop_mel_token=29, start_text_token=0,
            stop_text_token=1, condition_module=TINY_CONFORMER,
            condition_num_latent=8,
        ),
        sample_rate=24000,
    )


def test_normalize_english():
    out = normalize.normalize("I owe $23 and that's 1,234 reasons!")
    assert "twenty three dollars" in out
    assert "one thousand two hundred thirty four" in out
    assert "that is" in out
    assert out.endswith("!")


def test_normalize_routing_and_cjk():
    assert normalize.use_chinese("你好")
    assert normalize.use_chinese("ni3 hao3")  # pinyin
    assert not normalize.use_chinese("hello world")
    spaced = normalize.tokenize_by_CJK_char("你好 hello 世界")
    assert spaced == "你 好 HELLO 世 界"
    # j/q/x pinyin respelling
    assert normalize.correct_pinyin("qu2") == "QV2"
    assert normalize.correct_pinyin("ma3") == "ma3"


def test_conformer_shapes():
    conf = Conformer(TINY_CONFORMER)
    mel = jnp.asarray(np.random.default_rng(0).standard_normal((2, 21, 16)),
                      dtype=jnp.float32)
    out = conf(mel)
    # conv2d2: T' = (21 - 3 + 2) // 2 = 10
    assert out.shape == (2, 10, 32)


def test_perceiver_latents():
    pr = PerceiverResampler(32, n_dim_context=48, n_latents=8, n_heads=4,
                            n_ff_mult=2)
    ctx = jnp.asarray(np.random.default_rng(1).standard_normal((2, 12, 48)),
                      dtype=jnp.float32)
    out = pr(ctx)
    assert out.shape == (2, 8, 32)


def test_ecapa_embedding_shape():
    args = ECPATDNNArgs(input_size=16, lin_neurons=24,
                        channels=[32, 32, 32, 32, 64],
                        res2net_scale=4, se_channels=16,
                        attention_channels=16)
    enc = ECPATDNN(args)
    mel = jnp.asarray(np.random.default_rng(2).standard_normal((2, 30, 16)),
                      dtype=jnp.float32)
    out = enc(mel)
    assert out.shape == (2, 1, 24)


def test_gpt_prefill_step_consistency():
    """step(t+1 | prefill(t)) must equal prefill(t+1)'s last hidden."""
    gpt = GPT2Model(GPT2Args(n_embd=32, n_head=4, n_layer=2))
    rng = np.random.default_rng(3)
    embeds = jnp.asarray(rng.standard_normal((1, 6, 32)) * 0.1,
                         dtype=jnp.float32)
    pad = jnp.zeros((1, 2, 32), dtype=jnp.float32)

    caches = gpt.init_cache(1, max_len=16)
    h_full, _ = gpt.prefill(caches, jnp.concatenate([embeds, pad], axis=1),
                            jnp.asarray(6, dtype=jnp.int32))

    caches = gpt.init_cache(1, max_len=16)
    _, caches = gpt.prefill(caches, embeds[:, :5],
                            jnp.asarray(5, dtype=jnp.int32))
    h_step, _ = gpt.step(caches, embeds[:, 5:6])
    np.testing.assert_allclose(np.asarray(h_step), np.asarray(h_full),
                               atol=1e-5)


def test_log_mel_shape():
    audio = jnp.asarray(np.random.default_rng(4).standard_normal(2400),
                        dtype=jnp.float32)
    mel = log_mel_spectrogram(audio, n_mels=16, n_fft=64, hop_length=16)
    assert mel.shape[0] == 1 and mel.shape[2] == 16


class _FakeSpm:
    def encode(self, text):
        return [(ord(c) % 30) + 2 for c in text[:12]]


def test_indextts_generate_e2e():
    model = Model(tiny_model_config(), tokenizer=_FakeSpm())
    ref_mel = jnp.asarray(
        np.random.default_rng(5).standard_normal((1, 21, 16)),
        dtype=jnp.float32)
    results = list(model.generate("hello world", ref_mel=ref_mel,
                                  max_tokens=12, chunk=4, temperature=0.8,
                                  seed=0))
    assert len(results) == 1
    r = results[0]
    assert r.sample_rate == 24000
    assert r.audio.ndim == 1
    # latent count x4 bigvgan upsample
    assert r.audio.size == r.token_count * 4
    assert r.token_count >= 1


def test_vocoder_sub_batch_cap_is_exact(monkeypatch):
    """Capped BigVGAN sub-batches (the 16-row OOM guard) must produce
    audio identical to one whole-group call — splitting a group changes
    dispatch count only, never values."""
    import mlx_audio_tpu.models.tts.indextts.indextts as it

    model = Model(tiny_model_config(), tokenizer=_FakeSpm())
    ref_mel = jnp.asarray(
        np.random.default_rng(5).standard_normal((1, 21, 16)),
        dtype=jnp.float32)
    texts = ["hello world"] * 6

    monkeypatch.setattr(it, "VOCODER_SUB_BATCH", 100)   # one whole group
    whole = model.generate_batch(texts, ref_mel=ref_mel, max_tokens=8,
                                 chunk=4, temperature=0.8, seed=0)
    monkeypatch.setattr(it, "VOCODER_SUB_BATCH", 4)     # forces a split
    split = model.generate_batch(texts, ref_mel=ref_mel, max_tokens=8,
                                 chunk=4, temperature=0.8, seed=0)
    for w, s in zip(whole, split):
        np.testing.assert_array_equal(w.audio, s.audio)


def test_indextts_sanitize():
    model = Model(tiny_model_config(), tokenizer=_FakeSpm())
    weights = {
        # HF GPT2 Conv1D [in, out] -> transposed
        "gpt.h.0.attn.c_attn.weight": np.zeros((32, 96)),
        "gpt.h.0.attn.bias": np.zeros((1, 1, 8, 8)),  # mask buffer: dropped
        "perceiver_encoder.norm.gamma": np.ones((32,)),
        "perceiver_encoder.layers.0.0.to_kv.weight": np.zeros((64, 32)),
        # conformer depthwise conv torch [C, 1, K]
        "conditioning_encoder.encoders.0.conv_module.depthwise_conv.weight":
            np.zeros((32, 1, 7)),
        # bigvgan convT torch [I, O, K]
        "ups.0.0.weight_v": np.zeros((32, 16, 4)),
        "speaker_encoder.blocks.0.conv.conv.weight": np.zeros((32, 16, 5)),
    }
    out = model.sanitize(weights)
    assert out["gpt.h.0.attn.c_attn.weight"].shape == (96, 32)
    assert "gpt.h.0.attn.bias" not in out
    assert "perceiver_encoder.norm.weight" in out
    assert out["perceiver_encoder.layers.0.0.linear_k.weight"].shape == (32, 32)
    assert out[
        "conditioning_encoder.encoders.0.conv_module.depthwise_conv.weight"
    ].shape == (7, 1, 32)
    assert out["bigvgan.ups.0.0.weight_v"].shape == (4, 32, 16)
    assert out["bigvgan.speaker_encoder.blocks.0.conv.weight"].shape == (5, 16, 32)


def test_rel_pos_table_grows():
    """Ref mels longer than pos_emb_max_len must regrow the sin/cos table
    (reference attention.py:160-164)."""
    conf = Conformer(TINY_CONFORMER)  # pos_emb_max_len = 64
    mel = jnp.asarray(np.random.default_rng(6).standard_normal((1, 151, 16)),
                      dtype=jnp.float32)
    out = conf(mel)  # T' = (151 - 3 + 2) // 2 = 75 > 64
    assert out.shape == (1, 75, 32)
