"""Whisper tests: decode loops (greedy + the new beam search), filters,
mel frontend, end-to-end transcription on a tiny model with a synthetic
tiktoken vocabulary."""

import base64
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_audio_tpu.models.stt.whisper.audio import log_mel_spectrogram, pad_or_trim
from mlx_audio_tpu.models.stt.whisper.decoding import DecodingOptions
from mlx_audio_tpu.models.stt.whisper.model import ModelDimensions, WhisperModel
from mlx_audio_tpu.models.stt.whisper import api
from mlx_audio_tpu.models.stt.whisper.tokenizer import (
    Tokenizer,
    whisper_special_tokens,
)


def tiny_encoding(n_base: int = 256, num_languages: int = 4):
    """Synthetic byte-level tiktoken encoding with the Whisper special-token
    layout on top."""
    import tiktoken

    ranks = {bytes([i]): i for i in range(n_base)}
    special_tokens = {}
    n_vocab = n_base
    for token in whisper_special_tokens(num_languages):
        special_tokens[token] = n_vocab
        n_vocab += 1
    return tiktoken.Encoding(
        name="tiny-test",
        explicit_n_vocab=n_vocab,
        pat_str=r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""",
        mergeable_ranks=ranks,
        special_tokens=special_tokens,
    )


@pytest.fixture(scope="module")
def tokenizer():
    return Tokenizer(encoding=tiny_encoding(), num_languages=4,
                     language="en", task="transcribe")


def tiny_dims(tokenizer):
    return ModelDimensions(
        n_mels=80,
        n_audio_ctx=100,      # 200-frame (2 s) windows for test speed
        n_audio_state=32,
        n_audio_head=2,
        n_audio_layer=2,
        n_vocab=tokenizer.encoding.n_vocab,
        n_text_ctx=128,
        n_text_state=32,
        n_text_head=2,
        n_text_layer=2,
    )


@pytest.fixture(scope="module")
def model(tokenizer):
    return WhisperModel(tiny_dims(tokenizer))


def test_log_mel_shape():
    x = np.random.default_rng(0).standard_normal(16000).astype(np.float32)
    mel = np.asarray(log_mel_spectrogram(x))
    assert mel.shape == (100, 80)
    assert np.isfinite(mel).all()


def test_log_mel_matches_reference_semantics():
    """Silence should map to the compressed floor value."""
    mel = np.asarray(log_mel_spectrogram(np.zeros(16000, dtype=np.float32)))
    # log10(1e-10) -> clamped to max-8; overall scale (x+4)/4
    assert np.allclose(mel, mel.max() - 0.0, atol=2.0)
    assert mel.max() <= 0.0  # silence is far below 0 after scaling... floor
    assert np.isfinite(mel).all()


def test_encoder_shape(model):
    mel = jnp.zeros((1, 200, 80))
    feats = model.encoder(mel)
    assert feats.shape == (1, 100, 32)


def test_greedy_decode_runs(model, tokenizer):
    mel = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 200, 80)) * 0.1,
        dtype=jnp.float32,
    )
    res = api.decode(model, mel[0], DecodingOptions(language="en", sample_len=12),
                     tokenizer=tokenizer)
    assert res.language == "en"
    assert isinstance(res.tokens, list)
    assert all(t < tokenizer.encoding.n_vocab for t in res.tokens)
    assert np.isfinite(res.avg_logprob)
    assert res.compression_ratio > 0 or res.text == ""


def test_decode_batched(model, tokenizer):
    mel = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 200, 80)) * 0.1,
        dtype=jnp.float32,
    )
    res = api.decode(model, mel, DecodingOptions(language="en", sample_len=8),
                     tokenizer=tokenizer)
    assert len(res) == 2


def test_beam_search_decode(model, tokenizer):
    mel = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 200, 80)) * 0.1,
        dtype=jnp.float32,
    )
    res_beam = api.decode(
        model, mel[0],
        DecodingOptions(language="en", sample_len=12, beam_size=3),
        tokenizer=tokenizer,
    )
    res_greedy = api.decode(
        model, mel[0], DecodingOptions(language="en", sample_len=12),
        tokenizer=tokenizer,
    )
    assert isinstance(res_beam.tokens, list)
    # beam search explores a superset of greedy's single path: its selected
    # cumulative logprob can't be (meaningfully) worse
    def total_lp(r):
        return r.avg_logprob * (len(r.tokens) + 1)
    assert total_lp(res_beam) >= total_lp(res_greedy) - 1e-3


def test_temperature_sampling_decode(model, tokenizer):
    mel = jnp.asarray(
        np.random.default_rng(4).standard_normal((1, 200, 80)) * 0.1,
        dtype=jnp.float32,
    )
    res = api.decode(
        model, mel[0],
        DecodingOptions(language="en", sample_len=8, temperature=0.8, best_of=2),
        tokenizer=tokenizer,
    )
    assert isinstance(res.tokens, list)


def test_without_timestamps(model, tokenizer):
    # without_timestamps removes the timestamp *rules* (the model is steered
    # by <|notimestamps|>); with random weights we only check the decode
    # path runs and respects the token budget.
    mel = jnp.zeros((1, 200, 80))
    res = api.decode(
        model, mel[0],
        DecodingOptions(language="en", sample_len=8, without_timestamps=True),
        tokenizer=tokenizer,
    )
    assert len(res.tokens) <= 8
    assert all(0 <= t < tokenizer.encoding.n_vocab for t in res.tokens)


def test_timestamp_rules_filter(tokenizer):
    """At sample start, only timestamps may be emitted; after a lone
    timestamp token, text is allowed; after a pair, text is forced."""
    from mlx_audio_tpu.models.stt.whisper.decoding import FilterConfig, apply_filters

    v = tokenizer.encoding.n_vocab
    cfg = FilterConfig(
        eot=tokenizer.eot,
        timestamp_begin=tokenizer.timestamp_begin,
        no_timestamps=tokenizer.no_timestamps,
        max_initial_timestamp_index=50,
        apply_timestamp_rules=True,
    )
    zeros = jnp.zeros((1, v))
    sup = jnp.zeros((v,))
    blank = jnp.zeros((v,))
    ts0 = tokenizer.timestamp_begin

    # at start: non-timestamp tokens are -inf
    tokens = jnp.full((1, 16), tokenizer.eot, dtype=jnp.int32)
    out = apply_filters(zeros, tokens, jnp.asarray(3), jnp.asarray(3), cfg, sup, blank)
    out = np.asarray(out)[0]
    assert np.isneginf(out[: ts0 - 1]).all()  # text suppressed (except maybe none)
    assert np.isfinite(out[ts0])

    # after a pair of timestamps, next must be text
    tokens = jnp.asarray([[ts0 + 60, ts0 + 1, ts0 + 2] + [0] * 13], dtype=jnp.int32)
    # seq: positions 0.. with sample_begin=0, t=3; last two are timestamps
    out2 = np.asarray(apply_filters(zeros, tokens, jnp.asarray(3), jnp.asarray(0),
                                    cfg, sup, blank))[0]
    assert np.isneginf(out2[ts0:]).all()


def test_transcribe_end_to_end(model, tokenizer, monkeypatch):
    """Drive Model.generate on 1 s of noise with the synthetic tokenizer."""
    from mlx_audio_tpu.models.stt.whisper.transcribe import Model

    m = Model(tiny_dims(tokenizer))
    monkeypatch.setattr(Model, "_tokenizer", lambda self, language=None, task=None: tokenizer)
    audio = np.random.default_rng(5).standard_normal(2 * 16000).astype(np.float32) * 0.05

    out = m.generate(audio, temperature=0.0, language="en",
                     no_speech_threshold=None, logprob_threshold=None,
                     compression_ratio_threshold=None)
    assert out.language == "en"
    assert isinstance(out.text, str)
    assert isinstance(out.segments, list)


def test_writers(tmp_path):
    from mlx_audio_tpu.models.stt.whisper.writers import get_writer

    result = {
        "text": "hello world",
        "segments": [
            {"start": 0.0, "end": 1.5, "text": " hello"},
            {"start": 1.5, "end": 3.0, "text": " world"},
        ],
        "language": "en",
    }
    for fmt, check in [
        ("txt", "hello"),
        ("srt", "00:00:00,000 --> 00:00:01,500"),
        ("vtt", "WEBVTT"),
        ("json", '"text"'),
        ("tsv", "start\tend\ttext"),
    ]:
        w = get_writer(fmt, str(tmp_path))
        path = w(result, "audio.wav")
        content = open(path).read()
        assert check in content, (fmt, content)


def test_seek_and_segmentation_logic(model, tokenizer, monkeypatch):
    """Window-seek arithmetic and timestamp segmentation driven by scripted
    decode results (reference whisper.py:583-849 semantics): consecutive
    timestamp pairs advance seek to the last pair boundary; a
    single-timestamp ending consumes the whole window; silent windows are
    skipped; temperature fallback retries on bad compression ratio."""
    from mlx_audio_tpu.models.stt.whisper import transcribe as T
    from mlx_audio_tpu.models.stt.whisper.decoding import DecodingResult

    m = T.Model(tiny_dims(tokenizer))
    monkeypatch.setattr(
        T.Model, "_tokenizer", lambda self, language=None, task=None: tokenizer
    )

    ts = tokenizer.timestamp_begin
    txt = tokenizer.encode("hi")
    calls = []

    def scripted(model_, segment, options, tokenizer=None):
        calls.append(options.temperature)
        i = len([c for c in calls if True]) - 1
        if len(calls) == 1:
            # consecutive pair at <|1.00|> (pos 50), ending in text: seek
            # must advance to pos 50 * 2 frames, NOT the full window
            return DecodingResult(
                audio_features=None, language="en",
                tokens=[ts + 0] + txt + [ts + 50, ts + 50] + txt,
                avg_logprob=-0.1, no_speech_prob=0.0, temperature=0.0,
                compression_ratio=1.0,
            )
        if len(calls) == 2:
            # silent window: skipped, advances a full window
            return DecodingResult(
                audio_features=None, language="en", tokens=txt,
                avg_logprob=-5.0, no_speech_prob=0.99, temperature=0.0,
                compression_ratio=1.0,
            )
        if len(calls) == 3:
            # repetitive output at t=0 -> fallback retries at t=0.5
            return DecodingResult(
                audio_features=None, language="en", tokens=txt,
                avg_logprob=-0.1, no_speech_prob=0.0, temperature=0.0,
                compression_ratio=99.0,
            )
        # fallback succeeds: single-timestamp ending consumes the window
        return DecodingResult(
            audio_features=None, language="en",
            tokens=[ts + 0] + txt + [ts + 80],
            avg_logprob=-0.1, no_speech_prob=0.0, temperature=0.5,
            compression_ratio=1.0,
        )

    monkeypatch.setattr(T.api, "decode", scripted)

    # 5 s of audio = 500 content frames; windows of 200 frames (2 s)
    audio = np.zeros(5 * 16000, dtype=np.float32)
    out = m.generate(audio, temperature=(0.0, 0.5), language="en",
                     condition_on_previous_text=False)

    # window 1 at seek=0 produced one segment [0.00s, 1.00s] then seek=100;
    # window 2 (silent) advanced to 300; window 3 fell back then consumed
    # the rest
    assert [round(c, 2) for c in calls] == [0.0, 0.0, 0.0, 0.5]
    segs = out.segments
    assert len(segs) == 2
    assert segs[0]["start"] == 0.0 and abs(segs[0]["end"] - 1.0) < 1e-6
    assert segs[0]["seek"] == 0
    # third window starts after seek=100 (pair boundary) + 200 (skipped)
    assert segs[1]["seek"] == 300
    assert abs(segs[1]["start"] - 3.0) < 1e-6
    assert segs[1]["temperature"] == 0.5


def test_hallucination_silence_skipping(model, tokenizer, monkeypatch):
    """With word_timestamps + hallucination_silence_threshold, an anomalous
    segment surrounded by silence is dropped and seek jumps forward
    (reference whisper.py:737-802 semantics), driven by scripted decode
    results and scripted word timings."""
    from mlx_audio_tpu.models.stt.whisper import transcribe as T
    from mlx_audio_tpu.models.stt.whisper.decoding import DecodingResult

    m = T.Model(tiny_dims(tokenizer))
    monkeypatch.setattr(
        T.Model, "_tokenizer", lambda self, language=None, task=None: tokenizer
    )

    ts = tokenizer.timestamp_begin
    txt = tokenizer.encode("hi")

    def scripted(model_, segment, options, tokenizer=None):
        # one window: a pair-sliced segment ending in text (no single-ts
        # ending), so the hallucination path runs
        return DecodingResult(
            audio_features=None, language="en",
            tokens=[ts + 10] + txt + [ts + 40, ts + 40] + txt,
            avg_logprob=-0.1, no_speech_prob=0.0, temperature=0.0,
            compression_ratio=1.0,
        )

    def scripted_words(segments, **kwargs):
        # first sliced segment gets anomalous words (very low probability,
        # tiny duration -> anomaly score >= 3), isolated by silence
        for i, seg in enumerate(segments):
            if i == 0:
                seg["words"] = [
                    {"word": "hi", "start": seg["start"],
                     "end": seg["start"] + 0.01, "probability": 0.01},
                    {"word": "hi", "start": seg["start"] + 0.01,
                     "end": seg["start"] + 0.02, "probability": 0.01},
                    {"word": "hi", "start": seg["start"] + 0.02,
                     "end": seg["start"] + 0.03, "probability": 0.01},
                ]
            else:
                seg["words"] = [
                    {"word": "ok", "start": seg["start"],
                     "end": seg["end"], "probability": 0.9},
                ]

    monkeypatch.setattr(T.api, "decode", scripted)
    monkeypatch.setattr(T, "add_word_timestamps", scripted_words)

    audio = np.zeros(2 * 16000, dtype=np.float32)  # single 2 s window
    out_plain = m.generate(audio, temperature=0.0, language="en",
                           word_timestamps=True,
                           condition_on_previous_text=False)
    n_plain = len(out_plain.segments)

    out = m.generate(audio, temperature=0.0, language="en",
                     word_timestamps=True,
                     hallucination_silence_threshold=0.05,
                     condition_on_previous_text=False)
    # the anomalous first segment must have been dropped by the
    # hallucination pass relative to the plain word-timestamps run
    assert len(out.segments) < n_plain


def test_merge_punctuations_semantics():
    """Pin the openai-whisper punctuation-merge contract: prepended marks
    (leading-space word in the prepend set) fold INTO the following word;
    appended marks fold into the preceding word; merged slots empty out
    but keep their place (token totals preserved)."""
    from mlx_audio_tpu.models.stt.whisper.timing import (
        WordTiming,
        merge_punctuations,
    )

    def wt(word, toks):
        return WordTiming(word, toks, 0.0, 0.0, 1.0)

    a = [wt(" “", [1]), wt(" hello", [2]), wt(",", [3]), wt(" world", [4]),
         wt("!", [5])]
    merge_punctuations(a, prepended="\"'“¿([{-", appended="\"'.。,，!！?？:：”)]}、")
    rendered = [(w.word, w.tokens) for w in a]
    assert rendered == [
        ("", []),
        (" “ hello,", [1, 2, 3]),
        ("", []),
        (" world!", [4, 5]),
        ("", []),
    ]
    # token order and totals survive the merge
    assert [t for w in a for t in w.tokens] == [1, 2, 3, 4, 5]


def test_iter_top_k_matches_lax_top_k():
    """The beam loop's iterative (argmax, mask) selection must match
    lax.top_k values exactly (indices may differ only on exact ties)."""
    from mlx_audio_tpu.models.stt.whisper.decoding import _iter_top_k

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 5000)).astype(np.float32))
    v_ref, i_ref = jax.lax.top_k(x, 10)
    v_got, i_got = _iter_top_k(x, 10)
    np.testing.assert_array_equal(np.asarray(v_got), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(i_got), np.asarray(i_ref))


def test_beam_search_patience(model, tokenizer):
    """patience > 1 keeps searching for round(beam*patience) finished
    candidates (previously silently ignored); result stays a valid decode."""
    mel = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 200, 80)) * 0.1,
        dtype=jnp.float32,
    )
    res = api.decode(
        model, mel[0],
        DecodingOptions(language="en", sample_len=10, beam_size=2,
                        patience=2.0),
        tokenizer=tokenizer,
    )
    assert isinstance(res.tokens, list)
    assert np.isfinite(res.avg_logprob)


def test_bundled_tiktoken_assets_load_out_of_box(monkeypatch):
    """The real gpt2/multilingual vocabularies ship as package data
    (reference: stt/models/whisper/assets/ + tokenizer.py:334), so a fresh
    checkout needs no env vars or checkpoint-local copies."""
    from mlx_audio_tpu.models.stt.whisper import tokenizer as tok_mod

    monkeypatch.delenv("MLX_AUDIO_TPU_ASSETS", raising=False)
    tok_mod.get_encoding.cache_clear()
    tok_mod.get_tokenizer.cache_clear()
    try:
        multi = tok_mod.get_tokenizer(True, language="en", task="transcribe")
        assert multi.sot == 50258
        assert multi.encoding.n_vocab == 51865
        assert multi.decode(multi.encode("hello world")) == "hello world"
        en = tok_mod.get_tokenizer(False)
        assert en.eot == 50256
        assert en.decode(en.encode("hello world")) == "hello world"
    finally:
        tok_mod.get_encoding.cache_clear()
        tok_mod.get_tokenizer.cache_clear()


def test_beam_compaction_chunk_invariance(model, tokenizer):
    """The chunked beam loop with finished-audio compaction must produce
    candidate pools IDENTICAL to one uninterrupted run, with audios
    finishing at staggered times (an EOT logit boost makes random-weight
    rows actually finish inside the budget)."""
    from mlx_audio_tpu.models.stt.whisper.api import _prefill_jit
    from mlx_audio_tpu.models.stt.whisper.decoding import (
        FilterConfig,
        beam_search_loop,
    )

    n_audio, beam, sample_len = 5, 3, 40
    rng = np.random.default_rng(17)
    mel = jnp.asarray(rng.standard_normal((n_audio, 200, 80)) * 0.3,
                      dtype=jnp.float32)
    features = model.encoder(mel)
    buf_len = 8 + sample_len + 1
    tokens0 = np.full((n_audio, buf_len), tokenizer.eot, dtype=np.int32)
    tokens0[:, 0] = tokenizer.sot
    tokens0 = jnp.asarray(tokens0)
    cross_kv = model.decoder.compute_cross_kv(features)
    caches = model.decoder.init_cache(n_audio, buf_len,
                                      dtype=features.dtype)
    _, caches = _prefill_jit(model, caches, cross_kv, tokens0[:, :8],
                             jnp.asarray(1, jnp.int32), 0)
    tile = lambda x: jnp.repeat(x, beam, axis=0)
    caches_b = [c._replace(k=tile(c.k), v=tile(c.v)) for c in caches]
    cross_b = [(tile(ck), tile(cv)) for ck, cv in cross_kv]
    cfg = FilterConfig(eot=tokenizer.eot, timestamp_begin=10**9,
                       no_timestamps=10**9 + 1,
                       max_initial_timestamp_index=-1,
                       apply_timestamp_rules=False)
    n_vocab = model.dims.n_vocab
    boost = np.zeros((n_vocab,), np.float32)
    boost[tokenizer.eot] = 2.0          # makes rows finish, staggered
    boost = jnp.asarray(boost)
    zeros = jnp.zeros((n_vocab,), jnp.float32)

    def run(chunk):
        return beam_search_loop(
            model, [c._replace() for c in caches_b], list(cross_b),
            tile(tokens0), jnp.asarray(1, jnp.int32),
            jnp.asarray(1, jnp.int32), boost, zeros,
            sample_len=sample_len, beam_size=beam, params=cfg,
            chunk=chunk,
        )

    tok_a, len_a, sc_a = run(4)        # many compaction opportunities
    tok_b, len_b, sc_b = run(10_000)   # effectively one shot
    np.testing.assert_array_equal(len_a, len_b)
    np.testing.assert_allclose(sc_a, sc_b, rtol=1e-6)
    # compare token content only within each candidate's length
    for i in range(n_audio):
        for c in range(tok_a.shape[1]):
            n = len_a[i, c]
            np.testing.assert_array_equal(tok_a[i, c, :n], tok_b[i, c, :n])
    # sanity: the boost actually finished some audios early (pools full)
    assert (sc_a > -1e29).sum() > 0


def test_eot_cutoff_schedules_staggered_finishes(model, tokenizer):
    """DecodingOptions.eot_cutoff forces per-audio finish lengths (the
    retirement-bench instrument, VERDICT r4 #7): greedy rows cut exactly at
    their scheduled lengths, and beam search returns IDENTICAL results with
    compaction on and off while audios retire at different steps."""
    n_audio = 4
    mel = jnp.asarray(
        np.random.default_rng(11).standard_normal((n_audio, 200, 80)) * 0.1,
        dtype=jnp.float32,
    )
    cutoff = [2, 5, 9, 13]
    res = api.decode(
        model, mel,
        DecodingOptions(language="en", sample_len=16,
                        without_timestamps=True, eot_cutoff=cutoff),
        tokenizer=tokenizer,
    )
    assert [len(r.tokens) for r in res] == cutoff

    beam_opts = dict(language="en", sample_len=16, beam_size=2,
                     without_timestamps=True, eot_cutoff=cutoff)
    res_c = api.decode(model, mel, DecodingOptions(**beam_opts),
                       tokenizer=tokenizer)
    res_n = api.decode(model, mel,
                       DecodingOptions(**beam_opts, beam_compact=False),
                       tokenizer=tokenizer)
    for rc, rn in zip(res_c, res_n):
        assert rc.tokens == rn.tokens
        np.testing.assert_allclose(rc.avg_logprob, rn.avg_logprob,
                                   rtol=1e-5)
    assert [len(r.tokens) for r in res_c] == cutoff


def test_logit_bias_steers_decode(model, tokenizer):
    """DecodingOptions.logit_bias must reach the jitted loops: a large
    positive EOT bias ends greedy decoding immediately, and a large bias
    toward an arbitrary token makes greedy emit it."""
    mel = jnp.asarray(
        np.random.default_rng(8).standard_normal((1, 200, 80)) * 0.1,
        dtype=jnp.float32,
    )
    res = api.decode(
        model, mel[0],
        DecodingOptions(language="en", sample_len=12,
                        without_timestamps=True,
                        logit_bias={tokenizer.eot: 1e4}),
        tokenizer=tokenizer,
    )
    # suppress_blank blocks EOT at the very first sample position, so
    # at most ONE token precedes the forced EOT
    assert len(res.tokens) <= 1

    target = 7
    res2 = api.decode(
        model, mel[0],
        DecodingOptions(language="en", sample_len=6,
                        without_timestamps=True,
                        logit_bias={target: 1e4}),
        tokenizer=tokenizer,
    )
    assert res2.tokens and all(t == target for t in res2.tokens)

    # beam path: EOT bias finishes every audio right away
    res3 = api.decode(
        model, mel[0],
        DecodingOptions(language="en", sample_len=12, beam_size=3,
                        without_timestamps=True,
                        logit_bias={tokenizer.eot: 1e4}),
        tokenizer=tokenizer,
    )
    assert len(res3.tokens) <= 1
