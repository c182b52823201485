"""Kokoro model tests: shape contracts, mask-exactness under bucketing, and
pipeline chunking logic (cf. reference tts/tests/test_models.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_audio_tpu.models.tts.kokoro.model import (
    Model,
    ModelConfig,
    pick_frame_bucket,
    pick_phoneme_bucket,
)
from mlx_audio_tpu.models.tts.kokoro.pipeline import KokoroPipeline, MToken


def tiny_config():
    vocab = {c: i for i, c in enumerate("$abcdefghijklmnopqrstuvwxyz ")}
    return ModelConfig(
        istftnet={
            "resblock_kernel_sizes": [3, 7],
            "upsample_rates": [10, 6],
            "upsample_initial_channel": 64,
            "resblock_dilation_sizes": [[1, 3], [1, 3]],
            "upsample_kernel_sizes": [20, 12],
            "gen_istft_n_fft": 20,
            "gen_istft_hop_size": 5,
        },
        dim_in=32,
        dropout=0.1,
        hidden_dim=64,
        max_conv_dim=64,
        max_dur=50,
        multispeaker=True,
        n_layer=2,
        n_mels=40,
        n_token=len(vocab),
        style_dim=128,
        text_encoder_kernel_size=5,
        plbert={
            "hidden_size": 32,
            "num_attention_heads": 2,
            "intermediate_size": 64,
            "max_position_embeddings": 512,
            "num_hidden_layers": 2,
            "dropout": 0.1,
        },
        vocab=vocab,
    )


@pytest.fixture(scope="module")
def model():
    return Model(tiny_config())


def test_synthesize_shape_contract(model):
    phonemes = "hello world this is a test"
    ref_s = np.random.default_rng(0).standard_normal(256).astype(np.float32) * 0.1
    audio, pred_dur = model.synthesize(phonemes, ref_s)
    n_tokens = len([p for p in phonemes if p in model.vocab]) + 2
    assert pred_dur.shape == (n_tokens,)
    assert (pred_dur >= 1).all()
    total = int(pred_dur.sum())
    # 600 samples per frame contract (reference pipeline.py:294-297)
    assert audio.shape == (total * 600,)
    assert np.isfinite(audio).all()


def test_bucketing_is_exact(model):
    """The same phonemes must produce identical audio regardless of which
    frame/phoneme bucket padding executed them — masks must be exact."""
    phonemes = "abc def"
    ref_s = np.random.default_rng(1).standard_normal(256).astype(np.float32) * 0.1
    audio_a, dur_a = model.synthesize(phonemes, ref_s)

    # Force a bigger phoneme bucket by monkeypatching the bucket picker
    import mlx_audio_tpu.models.tts.kokoro.model as km

    orig_pb, orig_fb = km.pick_phoneme_bucket, km.pick_frame_bucket
    try:
        km.pick_phoneme_bucket = lambda n: 64
        km.pick_frame_bucket = lambda t: orig_fb(t) + 200
        audio_b, dur_b = model.synthesize(phonemes, ref_s)
    finally:
        km.pick_phoneme_bucket, km.pick_frame_bucket = orig_pb, orig_fb

    np.testing.assert_array_equal(dur_a, dur_b)
    np.testing.assert_allclose(audio_a, audio_b, atol=2e-4)


def test_prewarm_covers_serve_buckets(model):
    """prewarm compiles every (phoneme, frame) bucket combination a live
    request can hit: a follow-up synthesize() of a novel length must add
    NO new jit cache entries (new entries = the mid-reply compile stall
    prewarm exists to prevent)."""
    import mlx_audio_tpu.models.tts.kokoro.model as km

    issued = model.prewarm(max_phonemes=32, frames_per_phoneme=3)
    # phoneme buckets {16, 32}; both cap at one 100-frame bucket
    # (16*3=48 -> 100, 32*3=96 -> 100): 2 duration + 2 synthesis calls
    assert issued == 4

    d_before = km._duration_stage._cache_size()
    s_before = km._synthesis_stage._cache_size()
    phonemes = "hello world abc"       # 17 tokens -> the 32 bucket
    ref_s = np.random.default_rng(7).standard_normal(256).astype(
        np.float32) * 0.1
    # speed scales durations down so the frame total stays inside the
    # warmed 100-frame bucket even with random-weight duration heads
    audio, pred_dur = model.synthesize(phonemes, ref_s, speed=20.0)
    assert int(pred_dur.sum()) <= 100 and audio.size > 0
    assert km._duration_stage._cache_size() == d_before
    assert km._synthesis_stage._cache_size() == s_before


def test_synthesize_batch_matches_single(model):
    """Batched ragged synthesis: durations bit-equal to single-row runs;
    audio trimmed per row to its own frame total."""
    rng = np.random.default_rng(3)
    ps = ["hello world", "abc", "a longer third phoneme string here"]
    refs = (rng.standard_normal((3, 256)) * 0.1).astype(np.float32)

    outs = model.synthesize_batch(ps, refs)
    assert len(outs) == 3
    for (audio, dur), p in zip(outs, ps):
        n_tok = len([c for c in p if c in model.vocab]) + 2
        assert dur.shape == (n_tok,)
        assert audio.shape == (int(dur.sum()) * 600,)
        assert np.isfinite(audio).all()

    # durations are deterministic -> must match the single path exactly
    for (_, dur), p, r in zip(outs, ps, refs):
        _, dur_single = model.synthesize(p, r)
        np.testing.assert_array_equal(dur, dur_single)


def test_generate_batch_contract(model, tmp_path):
    rng = np.random.default_rng(4)
    pack = (rng.standard_normal((510, 1, 256)) * 0.1).astype(np.float32)
    vpath = str(tmp_path / "voice.npy")
    np.save(vpath, pack)
    results = model.generate_batch(["hello there", "abc def"], voice=vpath)
    assert len(results) == 2
    for r in results:
        assert r.samples > 0 and r.samples % 600 == 0
        assert np.isfinite(r.audio).all()


def test_speed_scales_durations(model):
    phonemes = "hello world"
    ref_s = np.zeros(256, dtype=np.float32)
    _, dur_slow = model.synthesize(phonemes, ref_s, speed=0.5)
    _, dur_fast = model.synthesize(phonemes, ref_s, speed=2.0)
    assert dur_slow.sum() > dur_fast.sum()


def test_bucket_pickers():
    assert pick_phoneme_bucket(5) == 16
    assert pick_phoneme_bucket(100) == 128
    assert pick_frame_bucket(1) == 100
    assert pick_frame_bucket(101) == 200
    assert pick_frame_bucket(200) == 200


def test_sanitize_lstm_and_conv_keys(model):
    from mlx_audio_tpu.models.tts.kokoro.model import sanitize

    w = {
        "text_encoder.lstm.weight_ih_l0": np.zeros((128, 64)),
        "text_encoder.lstm.weight_hh_l0_reverse": np.zeros((128, 32)),
        "predictor.duration_proj.linear_layer.weight": np.zeros((50, 64)),
        "decoder.generator.ups.0.weight_v": np.zeros((3, 64, 20)),  # torch convT [in,out,k]
        "decoder.generator.ups.0.weight_g": np.zeros((3, 1, 1)),
        "text_encoder.cnn.0.1.gamma": np.zeros((64,)),
        "bert.embeddings.position_ids": np.zeros((1, 512)),
        "decoder.generator.resblocks.0.alpha1.0": np.zeros((1, 64, 1)),
    }
    out = sanitize(w)
    assert "text_encoder.lstm.Wx_forward" in out
    assert "text_encoder.lstm.Wh_backward" in out
    assert "predictor.duration_proj.weight" in out
    assert out["decoder.generator.ups.0.weight_v"].shape == (20, 3, 64)
    assert out["decoder.generator.ups.0.weight_g"].shape == (1, 3, 1)
    assert "text_encoder.cnn.0.1.weight" in out
    assert not any("position_ids" in k for k in out)
    assert out["decoder.generator.resblocks.0.alpha1.0"].shape == (64,)


def test_sanitize_covers_model_paths(model):
    """Every sanitized reference-style key must land on a real model path."""
    from mlx_audio_tpu.nn.module import named_arrays

    paths = {p for p, _ in named_arrays(model)}
    # spot-check critical paths exist in the model pytree
    for p in [
        "bert.encoder.albert_layer_groups.0.albert_layers.0.attention.query.weight",
        "bert_encoder.weight",
        "predictor.lstm.Wx_forward",
        "predictor.F0.1.pool.weight_v",
        "text_encoder.cnn.0.0.weight_v",
        "decoder.generator.conv_post.weight_v",
        "decoder.generator.m_source.l_linear.weight",
        "decoder.generator.noise_convs.0.weight",
        "decoder.F0_conv.weight_v",
        "decoder.asr_res.0.weight_v",
        "decoder.decode.3.pool.weight_v",
    ]:
        assert p in paths, p


def test_pipeline_chunking_respects_budget():
    pipe = KokoroPipeline(lang_code="a", model=None)
    tokens = [MToken(text="word", phonemes="abcdefghij", whitespace=" ")
              for _ in range(120)]  # 11 phonemes each incl. space
    chunks = list(pipe.en_tokenize(tokens))
    assert len(chunks) > 1
    for _, ps, _ in chunks:
        assert len(ps) <= 510


def test_pipeline_waterfall_prefers_punctuation():
    pipe = KokoroPipeline(lang_code="a", model=None)
    tokens = []
    for i in range(60):
        tokens.append(MToken(text="word", phonemes="abcdefgh", whitespace=" "))
        if i == 30:
            tokens.append(MToken(text=".", phonemes=".", whitespace=" "))
    chunks = list(pipe.en_tokenize(tokens))
    assert chunks[0][1].endswith(".")


def test_join_timestamps():
    tokens = [
        MToken(text="hi", phonemes="ab", whitespace=" "),
        MToken(text="yo", phonemes="cd", whitespace=""),
    ]
    #           bos a  b  sp c  d  eos
    pred_dur = np.array([5, 4, 4, 2, 3, 3, 5])
    KokoroPipeline.join_timestamps(tokens, pred_dur)
    assert tokens[0].start_ts is not None
    assert tokens[0].end_ts > tokens[0].start_ts
    assert tokens[1].end_ts > tokens[1].start_ts


def test_bf16_forward_finite_and_close():
    """bf16 model forward stays finite and tracks f32 (f32 islands guard the
    long cumsums: instance-norm stats, SineGen phase, ISTFT unwrap)."""
    import jax.numpy as jnp

    cfg = tiny_config()
    model32 = Model(cfg)
    model16 = model32.astype(jnp.bfloat16)
    n = 16
    ids = jnp.asarray(np.random.default_rng(0).integers(1, cfg.n_token, (2, n)),
                      dtype=jnp.int32)
    lengths = jnp.full((2,), n, dtype=jnp.int32)
    ref32 = jnp.asarray(np.random.default_rng(1).standard_normal((2, 2 * cfg.style_dim))
                        * 0.1, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    num_frames = jnp.zeros((64,), dtype=jnp.int32)

    from mlx_audio_tpu.models.tts.kokoro.model import (
        _duration_stage,
        _synthesis_stage,
    )

    def run(model, ref):
        speed = jnp.ones((2,), dtype=ref.dtype)
        d, pred = _duration_stage(model, ids, lengths, ref[:, cfg.style_dim:],
                                  speed)
        pred = jnp.minimum(pred, 3)
        audio, total = _synthesis_stage(model, ids, lengths, d, pred, ref,
                                        key, num_frames)
        return np.asarray(audio, dtype=np.float64), np.asarray(total)

    a32, t32 = run(model32, ref32)
    a16, t16 = run(model16, ref32.astype(jnp.bfloat16))
    assert np.all(np.isfinite(a16))
    assert np.array_equal(t32, t16)  # durations must agree exactly
    # loose waveform agreement (random weights amplify bf16 noise)
    denom = np.sqrt(np.mean(a32 ** 2)) + 1e-9
    rel = np.sqrt(np.mean((a32 - a16) ** 2)) / denom
    assert rel < 0.6, rel


def test_voice_pack_formats_roundtrip(tmp_path):
    """load_voice_tensor reads every supported voice-pack container (.pt
    zipped-torch, .npz, .npy, .safetensors) to the same [510, 1, 256]
    float32 array; load_voice averages multi-voice specs (reference
    voice.py:8-83, pipeline.py:153-161)."""
    import pytest

    from mlx_audio_tpu.models.tts.kokoro.pipeline import (
        KokoroPipeline,
        load_voice_tensor,
    )

    rng = np.random.default_rng(0)
    ref = (rng.standard_normal((510, 1, 256)) * 0.1).astype(np.float32)

    paths = {}
    np.save(tmp_path / "v.npy", ref)
    paths["npy"] = tmp_path / "v.npy"
    np.savez(tmp_path / "v.npz", pack=ref)
    paths["npz"] = tmp_path / "v.npz"
    torch = pytest.importorskip("torch")
    torch.save(torch.from_numpy(ref), tmp_path / "v.pt")
    paths["pt"] = tmp_path / "v.pt"
    try:
        from safetensors.numpy import save_file

        save_file({"pack": ref}, str(tmp_path / "v.safetensors"))
        paths["safetensors"] = tmp_path / "v.safetensors"
    except ImportError:
        pass

    for kind, p in paths.items():
        got = load_voice_tensor(str(p))
        assert got.dtype == np.float32, kind
        np.testing.assert_allclose(got, ref, atol=1e-6, err_msg=kind)

    # multi-voice averaging through the pipeline cache
    other = (rng.standard_normal((510, 1, 256)) * 0.1).astype(np.float32)
    np.save(tmp_path / "w.npy", other)
    pipe = KokoroPipeline.__new__(KokoroPipeline)
    pipe.voices = {}
    avg = pipe.load_voice(f"{tmp_path}/v.npy,{tmp_path}/w.npy")
    np.testing.assert_allclose(avg, (ref + other) / 2, atol=1e-6)


class TestFallbackG2P:
    """Coverage contract of the dependency-free fallback (VERDICT weak #5):
    exact pass-through for phoneme-alphabet input, loud once-per-process
    degradation warning for everything else."""

    def test_phoneme_alphabet_input_exact(self):
        from mlx_audio_tpu.models.tts.kokoro.pipeline import FallbackG2P
        from mlx_audio_tpu.models.tts.kokoro.presets import kokoro_vocab

        g2p = FallbackG2P(kokoro_vocab())
        # real Kokoro phoneme strings (IPA + stress marks) survive untouched
        for ps in ["həlˈoʊ wˈɜɹld", "ðɪs ˈɪz ɐ tˈɛst", "kəkˈoɹoʊ"]:
            out, tokens = g2p(ps)
            assert out == ps
            assert all(t.phonemes for t in tokens)

    def test_non_vocab_chars_filtered_not_passed(self):
        from mlx_audio_tpu.models.tts.kokoro.pipeline import FallbackG2P
        from mlx_audio_tpu.models.tts.kokoro.presets import kokoro_vocab

        vocab = kokoro_vocab()
        g2p = FallbackG2P(vocab)
        out, _ = g2p("ħello wørld☃")   # chars outside the alphabet
        assert all(c in vocab or c == " " for c in out)

    def test_warns_loudly_once_per_process(self, monkeypatch):
        import warnings
        import mlx_audio_tpu.models.tts.kokoro.pipeline as pl

        monkeypatch.setattr(pl, "_FALLBACK_G2P_WARNED", False)
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            pl._warn_fallback_g2p_once()
            pl._warn_fallback_g2p_once()
        msgs = [w for w in rec if issubclass(w.category, RuntimeWarning)]
        assert len(msgs) == 1
        assert "DEGRADED" in str(msgs[0].message)
