"""Dia tests: delay pattern round-trip, CFG decode loop, end-to-end tiny
generation."""

import numpy as np
import pytest

import jax.numpy as jnp

from mlx_audio_tpu.models.tts.dia.audio import (
    apply_audio_delay,
    revert_audio_delay,
)
from mlx_audio_tpu.models.tts.dia.config import (
    DataConfig,
    DecoderConfig,
    DiaConfig,
    DiaModelConfig,
    EncoderConfig,
)
from mlx_audio_tpu.models.tts.dia.model import Model
from test_dac_snac import small_dac


def test_delay_roundtrip():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 1024, size=(1, 40, 4)).astype(np.int32)
    delay = [0, 2, 3, 5]
    delayed = apply_audio_delay(jnp.asarray(codes), pad_value=1025,
                                bos_value=1026, delay_pattern=delay)
    d = np.asarray(delayed)
    # channel c at time t holds codes[t - delay[c]]
    assert (d[0, :2, 1] == 1026).all()
    np.testing.assert_array_equal(d[0, 5:, 3], codes[0, :-5, 3])
    reverted = revert_audio_delay(delayed, pad_value=0, delay_pattern=delay,
                                  t_orig=40)
    r = np.asarray(reverted)
    # interior reverts exactly
    np.testing.assert_array_equal(r[0, : 40 - 5], codes[0, : 40 - 5])


def tiny_dia():
    cfg = DiaConfig(
        data=DataConfig(text_length=64, audio_length=128, channels=4,
                        delay_pattern=[0, 1, 2, 3]),
        model=DiaModelConfig(
            encoder=EncoderConfig(n_layer=1, n_embd=32, n_hidden=64,
                                  n_head=2, head_dim=16),
            decoder=DecoderConfig(n_layer=1, n_embd=32, n_hidden=64,
                                  gqa_query_heads=4, kv_heads=2,
                                  gqa_head_dim=8, cross_query_heads=2,
                                  cross_head_dim=16),
            src_vocab_size=128, tgt_vocab_size=1028, sample_rate=16000,
        ),
    )
    from mlx_audio_tpu.codec.dac import DAC, DACConfig

    # Dia samples codes in [0, 1024); the codec must have >= 1024 entries
    dac = DAC(DACConfig(
        encoder_dim=16, encoder_rates=[2, 4, 5, 8], decoder_dim=128,
        decoder_rates=[8, 5, 4, 2], n_codebooks=4, codebook_size=1024,
        codebook_dim=8, sample_rate=16000,
    ))
    return Model(cfg, dac_model=dac)


def test_dia_generate_end_to_end():
    model = tiny_dia()
    results = list(model.generate("[S1] hi [S2] hello", max_tokens=40,
                                  temperature=1.0, seed=0))
    assert len(results) == 1
    r = results[0]
    assert r.samples > 0
    assert np.isfinite(r.audio).all()


def test_dia_batched_dac_matches_per_row():
    """codebook_to_audio_batch groups equal-length rows into one DAC call;
    it must reproduce the per-row path exactly (incl. a ragged group)."""
    from mlx_audio_tpu.models.tts.dia.audio import (
        codebook_to_audio,
        codebook_to_audio_batch,
    )

    model = tiny_dia()
    dac = model._dac
    delay = model.config.data.delay_pattern
    c = model.config.data.channels
    rng = np.random.default_rng(5)
    rows = [rng.integers(0, 1024, size=(c, t)).astype(np.int32)
            for t in (40, 40, 52)]
    batched = codebook_to_audio_batch(rows, dac, delay, c=c)
    for row, got in zip(rows, batched):
        ref = codebook_to_audio(row, dac, delay, c=c)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_dia_encoder_bucket_exact():
    """Bucketing the padded-to-1024 encoder length down to the longest
    real text (model.py generate_batch) must not change the generated
    codes: pad keys are masked (exact-0 softmax terms) and cross-attn
    masks pad KV."""
    cfg = DiaConfig(
        data=DataConfig(text_length=512, audio_length=128, channels=4,
                        delay_pattern=[0, 1, 2, 3]),
        model=DiaModelConfig(
            encoder=EncoderConfig(n_layer=1, n_embd=32, n_hidden=64,
                                  n_head=2, head_dim=16),
            decoder=DecoderConfig(n_layer=1, n_embd=32, n_hidden=64,
                                  gqa_query_heads=4, kv_heads=2,
                                  gqa_head_dim=8, cross_query_heads=2,
                                  cross_head_dim=16),
            src_vocab_size=128, tgt_vocab_size=1028, sample_rate=16000,
        ),
    )
    from mlx_audio_tpu.codec.dac import DAC, DACConfig

    dac = DAC(DACConfig(
        encoder_dim=16, encoder_rates=[2, 4, 5, 8], decoder_dim=128,
        decoder_rates=[8, 5, 4, 2], n_codebooks=4, codebook_size=1024,
        codebook_dim=8, sample_rate=16000,
    ))
    model = Model(cfg, dac_model=dac)
    texts = ["[S1] short one [S2] ok", "[S1] reply [S2] fine"]
    bucketed = model.generate_batch(texts, max_tokens=16, temperature=1.0,
                                    seed=3)
    full = model.generate_batch(texts, max_tokens=16, temperature=1.0,
                                seed=3, _encoder_bucket=512)
    for a, b in zip(bucketed, full):
        np.testing.assert_array_equal(np.asarray(a.audio),
                                      np.asarray(b.audio))


def test_split_turns():
    model = tiny_dia()
    text = "[S1] a [S2] b [S1] c [S2] d [S1] e [S2] f"
    segs = model._split_turns(text)
    assert all("[S1]" in s and "[S2]" in s for s in segs)
    joined = " ".join(segs)
    for ch in "abcdef":
        assert ch in joined


def test_text_input_special_tokens():
    model = tiny_dia()
    src, pos, pad_mask, mask = model._prepare_text_input("[S1] hi")
    s = np.asarray(src)[0]
    assert s[0] == 1  # [S1] -> 0x01
    assert pad_mask.shape == (1, 64)


def test_dia_voice_clone_long_prompt():
    """Voice cloning with a reference longer than max_tokens frames: the
    decoder cache must fit BOS + prompt + generation (it was sized
    max_tokens+64 and silently clamp-overwrote), and the re-synthesized
    prompt frames must be excluded from the output (reference dia.py:581)."""
    model = tiny_dia()
    sr = model.config.model.sample_rate
    rng = np.random.default_rng(0)
    # ~1.6 s of reference audio -> 80 frames at 320x downsampling;
    # max_tokens=10 << prompt frames, so the old cache overflowed
    ref = (rng.standard_normal(sr) * 0.1).astype(np.float32)
    results = list(model.generate("[S1] hi", max_tokens=10, temperature=1.0,
                                  ref_audio=ref, ref_text="[S1] ref", seed=0))
    assert len(results) == 1
    audio = np.asarray(results[0].audio).reshape(-1)
    # output excludes the ~1 s reference reconstruction: at 10 generated
    # frames the waveform must be well under the reference length
    assert audio.shape[0] < sr // 2
