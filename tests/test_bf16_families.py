"""bf16 readiness across model families: generate/roundtrip paths must run
finite after `.astype(jnp.bfloat16)` (f32 islands — norm stats, phase
accumulation, sampling — are built in; see docs/DESIGN.md).  Kokoro, CSM,
Whisper and the causal-LM loop have dedicated bf16 tests elsewhere; this
covers the remaining families end-to-end on tiny configs."""

import numpy as np
import pytest

import jax.numpy as jnp


def test_dia_generate_bf16():
    from test_dia import tiny_dia

    model = tiny_dia().astype(jnp.bfloat16)
    results = list(model.generate("[S1] hi [S2] hello", max_tokens=24,
                                  temperature=1.0, seed=0))
    assert results and np.isfinite(results[0].audio).all()


def test_indextts_generate_bf16():
    from test_indextts import _FakeSpm, tiny_model_config
    from mlx_audio_tpu.models.tts.indextts.indextts import Model

    model = Model(tiny_model_config(), tokenizer=_FakeSpm()).astype(
        jnp.bfloat16)
    ref_mel = jnp.asarray(
        np.random.default_rng(5).standard_normal((1, 21, 16)),
        dtype=jnp.float32)
    results = list(model.generate("hello world", ref_mel=ref_mel,
                                  max_tokens=8, chunk=4, temperature=0.8,
                                  seed=0))
    assert results and np.isfinite(results[0].audio).all()


def test_mimi_roundtrip_bf16():
    from test_mimi import tiny_mimi

    codec = tiny_mimi(nq=4).astype(jnp.bfloat16)
    pcm = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 1, 1920 * 3)) * 0.1,
        dtype=jnp.float32)
    codes = codec.encode(pcm)
    audio = np.asarray(codec.decode(codes), dtype=np.float32)
    assert np.isfinite(audio).all()


def test_encodec_roundtrip_bf16():
    from test_encodec import small_encodec
    from mlx_audio_tpu.codec.encodec import preprocess_audio

    codec = small_encodec().astype(jnp.bfloat16)
    audio, mask = preprocess_audio(
        np.random.default_rng(1).standard_normal(24_000).astype(np.float32)
        * 0.1
    )
    codes, scales = codec.encode(audio, mask)
    out = np.asarray(codec.decode(codes, scales), dtype=np.float32)
    assert np.isfinite(out).all()


def test_dac_snac_bf16():
    from test_dac_snac import small_dac, small_snac

    rng = np.random.default_rng(2)
    pcm = jnp.asarray(rng.standard_normal((1, 1, 3200)) * 0.1,
                      dtype=jnp.float32)
    dac = small_dac().astype(jnp.bfloat16)
    z, codes, _ = dac.encode(pcm)
    assert np.isfinite(np.asarray(dac.decode(z), dtype=np.float32)).all()

    snac = small_snac().astype(jnp.bfloat16)
    pcm24 = jnp.asarray(rng.standard_normal((1, 1, 8192)) * 0.1,
                        dtype=jnp.float32)
    codes = snac.encode(pcm24)
    assert np.isfinite(np.asarray(snac.decode(codes),
                                  dtype=np.float32)).all()


def test_vocos_bigvgan_bf16():
    from test_vocos_bigvgan import small_bigvgan, small_vocos

    rng = np.random.default_rng(3)
    vocos = small_vocos().astype(jnp.bfloat16)
    feats = jnp.asarray(rng.standard_normal((1, 50, 100)) * 0.1,
                        dtype=jnp.float32)
    assert np.isfinite(np.asarray(vocos.decode(feats),
                                  dtype=np.float32)).all()

    bigv = small_bigvgan().astype(jnp.bfloat16)
    mel = jnp.asarray(rng.standard_normal((1, 20, 20)) * 0.1,
                      dtype=jnp.float32)
    out = bigv(mel)
    assert np.isfinite(np.asarray(out, dtype=np.float32)).all()


def test_parakeet_ctc_bf16():
    from test_parakeet import BaseParakeet, ctc_config

    model = BaseParakeet.from_config(ctc_config()).astype(jnp.bfloat16)
    audio = np.random.default_rng(4).standard_normal(8000).astype(
        np.float32) * 0.1
    out = model.generate(audio)
    assert isinstance(out.text, str)
