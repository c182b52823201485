"""Bark tests: three-stage generation with tiny GPTs + tiny EnCodec
(cf. reference tts/tests/test_models.py Bark suites)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mlx_audio_tpu.models.tts.bark.bark import (
    CODEBOOK_SIZE,
    N_COARSE_CODEBOOKS,
    N_FINE_CODEBOOKS,
    SEMANTIC_VOCAB_SIZE,
    Model,
    ModelConfig,
)
from test_encodec import small_encodec


class FakeBertTokenizer:
    def encode(self, text, add_special_tokens=False):
        return [ord(c) % 500 + 1 for c in text[:30]]


def tiny_gpt_cfg(in_vocab, out_vocab, **kw):
    d = dict(block_size=1024, input_vocab_size=in_vocab,
             output_vocab_size=out_vocab, n_layer=1, n_head=2, n_embd=32,
             bias=False)
    d.update(kw)
    return d


def tiny_bark():
    cfg = ModelConfig(
        semantic_config=tiny_gpt_cfg(129600, 129600),
        coarse_acoustics_config=tiny_gpt_cfg(12096, 12096),
        fine_acoustics_config=tiny_gpt_cfg(1056, 1056, n_codes_total=8,
                                           n_codes_given=1),
    )
    return Model(cfg, codec=small_encodec(), tokenizer=FakeBertTokenizer())


@pytest.fixture(scope="module")
def model():
    return tiny_bark()


def test_semantic_stage(model):
    toks = model.generate_text_semantic("hello world", temperature=0.7,
                                        max_steps=24)
    assert toks.ndim == 1
    assert len(toks) <= 24
    assert (toks < SEMANTIC_VOCAB_SIZE).all()


def test_coarse_stage(model):
    sem = np.random.default_rng(0).integers(0, SEMANTIC_VOCAB_SIZE, size=20)
    coarse = model.generate_coarse(sem.astype(np.int32), sliding_window_len=12)
    assert coarse.shape[0] == N_COARSE_CODEBOOKS
    # ~75/49.9*2 tokens per semantic token, interleaved into 2 codebooks
    assert coarse.shape[1] == int(20 * 75 / 49.9)
    assert (coarse >= 0).all() and (coarse < CODEBOOK_SIZE).all()


def test_fine_stage(model):
    coarse = np.random.default_rng(1).integers(
        0, CODEBOOK_SIZE, size=(N_COARSE_CODEBOOKS, 30)
    ).astype(np.int32)
    fine = model.generate_fine(coarse, temperature=0.5)
    assert fine.shape == (N_FINE_CODEBOOKS, 30)
    # coarse codebooks pass through unchanged
    np.testing.assert_array_equal(fine[:N_COARSE_CODEBOOKS], coarse)
    assert (fine >= 0).all() and (fine < CODEBOOK_SIZE + 1).all()


def test_end_to_end_generate(model):
    results = list(model.generate("hi", temperature=0.7, seed=0))
    assert len(results) == 1
    r = results[0]
    assert r.sample_rate == 24000
    assert r.samples > 0
    assert np.isfinite(r.audio).all()


def test_sanitize_gpt2_keys():
    m_cfg = ModelConfig(
        semantic_config=tiny_gpt_cfg(129600, 129600),
        coarse_acoustics_config=tiny_gpt_cfg(12096, 12096),
        fine_acoustics_config=tiny_gpt_cfg(1056, 1056),
    )
    m = Model(m_cfg, codec=None, tokenizer=FakeBertTokenizer())
    w = {
        "semantic._orig_mod.transformer.h.0.attn.att_proj.weight": np.zeros((96, 32)),
        "semantic._orig_mod.lm_head.weight": np.zeros((129600, 32)),
    }
    out = m.sanitize(w)
    assert "semantic.layers.0.attn.att_proj.weight" in out
    assert "semantic.lm_head.weight" in out


def test_coarse_kv_carry_matches_reprefill(model, monkeypatch):
    """Early sliding windows carry their KV caches (the next window's
    context is [prev context + generated tokens] at the same absolute
    positions); tokens must match the per-window re-prefill path exactly,
    including across a 192-bucket cache-capacity growth."""
    rng = np.random.default_rng(7)
    sems = [rng.integers(0, SEMANTIC_VOCAB_SIZE, size=80).astype(np.int32),
            rng.integers(0, SEMANTIC_VOCAB_SIZE, size=64).astype(np.int32)]

    monkeypatch.setenv("MLX_AUDIO_TPU_NO_COARSE_CARRY", "1")
    base = model.generate_coarse_batch(sems, temperature=0.7,
                                       sliding_window_len=16, seed=3)
    monkeypatch.delenv("MLX_AUDIO_TPU_NO_COARSE_CARRY")
    carry = model.generate_coarse_batch(sems, temperature=0.7,
                                        sliding_window_len=16, seed=3)
    for a, b in zip(base, carry):
        np.testing.assert_array_equal(a, b)


def test_coarse_kv_carry_with_voice_history(model, monkeypatch, tmp_path):
    """A voice prompt pre-fills semantic/coarse history (shorter exact-
    carry phase, truncation path engages earlier); carry must still match
    re-prefill."""
    rng = np.random.default_rng(8)
    voice = {
        "semantic_prompt": rng.integers(
            0, SEMANTIC_VOCAB_SIZE, size=40).astype(np.int32),
        "coarse_prompt": rng.integers(0, 1024, size=(2, 60)).astype(np.int32),
        "fine_prompt": rng.integers(0, 1024, size=(8, 60)).astype(np.int32),
    }
    sems = [rng.integers(0, SEMANTIC_VOCAB_SIZE, size=48).astype(np.int32)]

    monkeypatch.setenv("MLX_AUDIO_TPU_NO_COARSE_CARRY", "1")
    base = model.generate_coarse_batch(sems, voice=voice, temperature=0.7,
                                       sliding_window_len=12, seed=5)
    monkeypatch.delenv("MLX_AUDIO_TPU_NO_COARSE_CARRY")
    carry = model.generate_coarse_batch(sems, voice=voice, temperature=0.7,
                                        sliding_window_len=12, seed=5)
    for a, b in zip(base, carry):
        np.testing.assert_array_equal(a, b)
