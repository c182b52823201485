"""Depth-decoder int8 streaming draft kernel: interpret-mode parity vs the
XLA mirror (same packed weights, same sampling decisions)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_audio_tpu.models.lm.llama import LlamaConfig, LlamaModel
from mlx_audio_tpu.nn.pallas_depth import (
    _HAS_PALLAS,
    depth_draft_pallas,
    depth_draft_xla,
    dequant_ref,
    pack_depth,
    quantize_int8,
)

VOCAB = 64
NC = 8           # codebooks (tiny): steps = NC - 2 = 6
DB = 256         # backbone dim
DM = 128         # decoder dim
DH = 128


def tiny_decoder():
    cfg = LlamaConfig(
        num_hidden_layers=2, num_attention_heads=1, num_key_value_heads=1,
        head_dim=DH, hidden_size=DM, intermediate_size=256,
        rms_norm_eps=1e-5, vocab_size=VOCAB, max_position_embeddings=64,
        rope_theta=500_000,
    )
    return LlamaModel(cfg, use_embed_tokens=False)


@pytest.fixture(scope="module")
def packed():
    rng = np.random.default_rng(0)
    dec = tiny_decoder()
    proj = rng.standard_normal((DB, DM)).astype(np.float32) * 0.05
    head = rng.standard_normal((NC - 1, DM, VOCAB)).astype(np.float32) * 0.1
    emb = rng.standard_normal((NC * VOCAB, DB)).astype(np.float32) * 0.1
    return pack_depth(dec, proj, head, emb, VOCAB)


def _cache0(packed, rng):
    """Prefilled-cache stand-in: random K/V at positions 0..1."""
    n_layers = packed.wqkv.shape[0]
    cap = 40
    kc = np.zeros((n_layers, 1, cap, DH), np.float32)
    vc = np.zeros((n_layers, 1, cap, DH), np.float32)
    kc[:, :, :2] = rng.standard_normal((n_layers, 1, 2, DH)) * 0.3
    vc[:, :, :2] = rng.standard_normal((n_layers, 1, 2, DH)) * 0.3
    return jnp.asarray(kc), jnp.asarray(vc)


def test_quantize_roundtrip():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((256, 64)).astype(np.float32)
    codes, scales = quantize_int8(w)
    back = np.asarray(dequant_ref(jnp.asarray(codes), jnp.asarray(scales)))
    assert np.abs(back - w).max() < np.abs(w).max() / 100


@pytest.mark.skipif(not _HAS_PALLAS, reason="pallas unavailable")
@pytest.mark.parametrize("temp,top_k", [(0.0, 0), (0.9, 8)])
def test_depth_kernel_matches_xla_mirror(packed, temp, top_k):
    rng = np.random.default_rng(2)
    kc, vc = _cache0(packed, rng)
    c1 = jnp.asarray(3, jnp.int32)
    n_steps = NC - 2
    vpad = packed.heads.shape[2]
    if temp > 0:
        noise = jax.random.gumbel(jax.random.PRNGKey(0), (n_steps, vpad),
                                  dtype=jnp.float32)
    else:
        noise = jnp.zeros((n_steps, vpad), jnp.float32)

    ref = depth_draft_xla(packed, kc, vc, c1, noise, VOCAB,
                          temp, top_k)
    out = depth_draft_pallas(packed, kc, vc, c1, noise, VOCAB,
                             temp, top_k, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) < VOCAB).all()


# ---------------------------------------------------------------------------
# End-to-end speculative decode through the CSM model (exactness contract)
# ---------------------------------------------------------------------------


def test_csm_spec_decode_greedy_matches_plain():
    """enable_spec_decode + greedy must emit the exact same frames as the
    plain bf16/f32 sequential decode (draft->verify->finish is lossless)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_mimi import tiny_mimi
    from test_sesame import FakeTokenizer, tiny_config
    from mlx_audio_tpu.models.tts.sesame.model import Model

    m = Model(tiny_config(), mimi=tiny_mimi(nq=4),
              text_tokenizer=FakeTokenizer())
    ref_audio = np.random.default_rng(0).standard_normal(1920).astype(
        np.float32) * 0.1

    plain = list(m.generate("hello world", ref_audio=ref_audio,
                            ref_text="hi", max_audio_length_ms=640,
                            temperature=0.0, seed=5))

    m.model.enable_spec_decode(interpret=True)
    spec = list(m.generate("hello world", ref_audio=ref_audio,
                           ref_text="hi", max_audio_length_ms=640,
                           temperature=0.0, seed=5))
    assert len(plain) == len(spec)
    for a, b in zip(plain, spec):
        np.testing.assert_array_equal(np.asarray(a.audio),
                                      np.asarray(b.audio))


def test_csm_spec_decode_sampled_runs():
    """Sampled spec decode produces valid frames (distribution-equivalent
    Gumbel path; no exact-match contract vs the plain sampler)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_mimi import tiny_mimi
    from test_sesame import FakeTokenizer, tiny_config
    from mlx_audio_tpu.models.tts.sesame.model import Model

    m = Model(tiny_config(), mimi=tiny_mimi(nq=4),
              text_tokenizer=FakeTokenizer())
    m.model.enable_spec_decode(interpret=True)
    ref_audio = np.random.default_rng(1).standard_normal(1920).astype(
        np.float32) * 0.1
    out = list(m.generate("hey", ref_audio=ref_audio, ref_text="yo",
                          max_audio_length_ms=480, temperature=0.9,
                          top_k=10, seed=2))
    assert out and all(np.isfinite(np.asarray(r.audio)).all() for r in out)
