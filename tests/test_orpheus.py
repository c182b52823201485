"""Orpheus (llama TTS) tests: 7-token SNAC interleave round-trip, prompt
layout, end-to-end generation with a tiny model."""

import numpy as np
import pytest

import jax.numpy as jnp

from mlx_audio_tpu.codec.snac import SNAC, SNACConfig
from mlx_audio_tpu.models.tts.llama.llama import (
    AUDIO_MARK,
    CODE_OFFSET,
    EOH,
    EOT,
    SOH,
    STOP_AUDIO,
    Model,
    ModelConfig,
    decode_audio_from_codes,
    encode_audio_to_codes,
)
from mlx_audio_tpu.models.lm.causal import LlamaForCausalLM, generate_tokens
from mlx_audio_tpu.models.lm.llama import LlamaConfig


def tiny_snac():
    return SNAC(SNACConfig(
        sampling_rate=24000, encoder_dim=8, encoder_rates=[2, 4, 8, 8],
        decoder_dim=64, decoder_rates=[8, 8, 4, 2], attn_window_size=None,
        codebook_size=4096, codebook_dim=8, vq_strides=[4, 2, 1],
        noise=False, depthwise=True,
    ))


class FakeTokenizer:
    def __call__(self, text):
        class R:
            pass

        r = R()
        r.input_ids = [ord(c) % 100 + 10 for c in text[:24]]
        return r


def tiny_model():
    cfg = ModelConfig(
        hidden_size=64, num_hidden_layers=2, intermediate_size=128,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=128300 + 7 * 4096 + 10, max_position_embeddings=4096,
        tie_word_embeddings=True,
    )
    return Model(cfg, snac=tiny_snac(), tokenizer=FakeTokenizer())


def test_interleave_roundtrip():
    snac = tiny_snac()
    audio = np.random.default_rng(0).standard_normal(4096).astype(np.float32) * 0.1
    interleaved = encode_audio_to_codes(audio, snac)
    assert interleaved.shape[1] % 7 == 0
    # offsets per frame position: 0, 4096, 2*4096, ...
    frame = interleaved[0, :7]
    assert 0 <= frame[0] < 4096
    assert 4096 <= frame[1] < 2 * 4096
    assert 6 * 4096 <= frame[6] < 7 * 4096
    audio_out = decode_audio_from_codes(interleaved[0].tolist(), snac)
    assert audio_out.ndim == 2
    assert np.isfinite(audio_out).all()


def test_parse_output():
    m = tiny_model()
    row = [1, 2, AUDIO_MARK] + [CODE_OFFSET + i for i in range(15)] + [STOP_AUDIO]
    codes = m.parse_output(np.asarray([row]))
    assert codes[0] == list(range(14))  # trimmed to whole frames of 7


def test_prepare_input_ids_layout():
    m = tiny_model()
    rows = m.prepare_input_ids(["hello"], voice="tara")
    ids = rows[0]
    assert ids[0] == SOH
    assert ids[-2] == EOT
    assert ids[-1] == EOH


def test_generate_tokens_loop_stops():
    cfg = LlamaConfig(
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, hidden_size=32, intermediate_size=64, rms_norm_eps=1e-5,
        vocab_size=96, max_position_embeddings=512, tie_word_embeddings=True,
    )
    lm = LlamaForCausalLM(cfg)
    toks = []
    for chunk in generate_tokens(lm, np.arange(10), max_tokens=40,
                                 temperature=0.8, top_k=20, chunk=16, seed=3):
        toks.extend(chunk.tolist())
    assert 0 < len(toks) <= 40
    assert all(0 <= t < 96 for t in toks)


def test_generate_tokens_batch_matches_single_greedy():
    """Batched decode must produce the same greedy tokens per row as the
    single-prompt path (ragged prompts, per-row stop handling)."""
    from mlx_audio_tpu.models.lm.causal import generate_tokens_batch

    cfg = LlamaConfig(
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
        head_dim=8, hidden_size=16, intermediate_size=32, rms_norm_eps=1e-5,
        vocab_size=64, max_position_embeddings=256, tie_word_embeddings=True,
    )
    lm = LlamaForCausalLM(cfg)
    prompts = [np.arange(5), np.arange(3, 12)]

    singles = []
    for p in prompts:
        out = []
        for c in generate_tokens(lm, p, max_tokens=12, temperature=0.0,
                                 chunk=8):
            out.extend(c.tolist())
        singles.append(out)

    batch = generate_tokens_batch(lm, prompts, max_tokens=12, temperature=0.0,
                                  chunk=8)
    assert [b.tolist() for b in batch] == singles


def test_generate_tokens_batch_bf16_and_stops():
    import jax.numpy as jnp

    from mlx_audio_tpu.models.lm.causal import generate_tokens_batch

    cfg = LlamaConfig(
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
        head_dim=8, hidden_size=16, intermediate_size=32, rms_norm_eps=1e-5,
        vocab_size=32, max_position_embeddings=256, tie_word_embeddings=True,
    )
    lm = LlamaForCausalLM(cfg).astype(jnp.bfloat16)
    outs = generate_tokens_batch(
        lm, [np.arange(4), np.arange(6)], max_tokens=20, temperature=0.9,
        top_k=8, stop_tokens=(7,), chunk=8, seed=2,
    )
    assert len(outs) == 2
    for o in outs:
        assert len(o) <= 20
        assert 7 not in o.tolist()


def test_generate_tokens_greedy_deterministic():
    cfg = LlamaConfig(
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
        head_dim=8, hidden_size=16, intermediate_size=32, rms_norm_eps=1e-5,
        vocab_size=64, max_position_embeddings=256, tie_word_embeddings=True,
    )
    lm = LlamaForCausalLM(cfg)

    def run():
        out = []
        for c in generate_tokens(lm, np.arange(5), max_tokens=12,
                                 temperature=0.0, chunk=8):
            out.extend(c.tolist())
        return out

    assert run() == run()


def test_repetition_penalty_reduces_repeats():
    cfg = LlamaConfig(
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
        head_dim=8, hidden_size=16, intermediate_size=32, rms_norm_eps=1e-5,
        vocab_size=32, max_position_embeddings=256, tie_word_embeddings=True,
    )
    lm = LlamaForCausalLM(cfg)
    plain = []
    for c in generate_tokens(lm, np.arange(5), max_tokens=30, temperature=0.0,
                             chunk=16):
        plain.extend(c.tolist())
    pen = []
    for c in generate_tokens(lm, np.arange(5), max_tokens=30, temperature=0.0,
                             repetition_penalty=5.0, repetition_context_size=8,
                             chunk=16):
        pen.extend(c.tolist())
    # greedy decoding of an untrained model collapses to repeats; the
    # penalty must strictly increase diversity
    assert len(set(pen)) >= len(set(plain))


def test_orpheus_generate_batch_plumbing(monkeypatch):
    """generate_batch: prompt+generated concat, per-row parse, SNAC decode."""
    import mlx_audio_tpu.models.lm.causal as causal

    m = tiny_model()
    fake = [
        np.asarray([AUDIO_MARK] + [CODE_OFFSET + i for i in range(14)]),
        np.asarray([AUDIO_MARK] + [CODE_OFFSET + i for i in range(7)]),
    ]
    monkeypatch.setattr(causal, "generate_tokens_batch",
                        lambda *a, **k: fake)
    results = m.generate_batch(["first", "second"], voice="tara")
    assert len(results) == 2
    for r in results:
        assert r.samples > 0
        assert np.isfinite(r.audio).all()
