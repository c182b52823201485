"""Parakeet tests: conformer shapes, TDT/RNNT/CTC greedy loops, chunk
merging (cf. reference stt/tests/test_models.py Parakeet suite)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mlx_audio_tpu.models.stt.parakeet import BaseParakeet
from mlx_audio_tpu.models.stt.parakeet.alignment import (
    AlignedToken,
    merge_longest_common_subsequence,
    merge_longest_contiguous,
    tokens_to_sentences,
)


VOCAB = [c for c in "abcdefghij"] + ["▁the", "▁cat", ".", "!"]


def tdt_config(target="nemo.collections.asr.models.rnnt_bpe_models.EncDecRNNTBPEModel",
               tdt=True):
    return {
        "target": target,
        "model_defaults": {"tdt_durations": [0, 1, 2, 3, 4] if tdt else None},
        "preprocessor": {
            "sample_rate": 16000, "normalize": "per_feature",
            "window_size": 0.025, "window_stride": 0.01, "window": "hann",
            "features": 80, "n_fft": 512, "dither": 0.0,
        },
        "encoder": {
            "feat_in": 80, "n_layers": 2, "d_model": 64, "n_heads": 4,
            "ff_expansion_factor": 2, "subsampling_factor": 4,
            "self_attention_model": "rel_pos", "subsampling": "dw_striding",
            "conv_kernel_size": 9, "subsampling_conv_channels": 32,
            "pos_emb_max_len": 5000,
        },
        "decoder": {
            "blank_as_pad": True, "vocab_size": len(VOCAB),
            "prednet": {"pred_hidden": 32, "pred_rnn_layers": 1},
        },
        "joint": {
            "num_classes": len(VOCAB),
            "vocabulary": VOCAB,
            "jointnet": {"joint_hidden": 32, "activation": "relu",
                         "encoder_hidden": 64, "pred_hidden": 32},
            "num_extra_outputs": 5 if tdt else 0,
        },
        "decoding": {"model_type": "tdt", "durations": [0, 1, 2, 3, 4],
                     "greedy": {"max_symbols": 5}} if tdt
        else {"greedy": {"max_symbols": 5}},
    }


def ctc_config():
    cfg = tdt_config("nemo.collections.asr.models.ctc_bpe_models.EncDecCTCModelBPE",
                     tdt=False)
    cfg["model_defaults"] = {}
    cfg["decoder"] = {"feat_in": 64, "num_classes": -1, "vocabulary": VOCAB}
    cfg["decoding"] = {"greedy": None}
    return cfg


def test_tdt_decode():
    model = BaseParakeet.from_config(tdt_config())
    audio = np.random.default_rng(0).standard_normal(16000).astype(np.float32) * 0.1
    result = model.generate(audio)
    assert isinstance(result.text, str)
    for s in result.sentences:
        for t in s.tokens:
            assert t.start >= 0 and t.duration >= 0


def test_rnnt_decode():
    cfg = tdt_config(tdt=False)
    cfg["model_defaults"] = {"tdt_durations": None}
    model = BaseParakeet.from_config(cfg)
    audio = np.zeros(8000, dtype=np.float32)
    result = model.generate(audio)
    assert isinstance(result.text, str)


def test_ctc_decode():
    model = BaseParakeet.from_config(ctc_config())
    audio = np.random.default_rng(1).standard_normal(8000).astype(np.float32) * 0.1
    result = model.generate(audio)
    assert isinstance(result.text, str)


def test_chunked_generate_merges():
    model = BaseParakeet.from_config(ctc_config())
    audio = np.random.default_rng(2).standard_normal(4 * 16000).astype(np.float32) * 0.1
    result = model.generate(audio, chunk_duration=2.0, overlap_duration=1.0)
    assert isinstance(result.text, str)


def _tok(i, start, dur=0.1):
    from mlx_audio_tpu.models.stt.parakeet.alignment import decode_tokens

    return AlignedToken(i, text=decode_tokens([i], VOCAB), start=start,
                        duration=dur)


def test_merge_contiguous_agreeing_overlap():
    a = [_tok(0, 0.0), _tok(1, 0.2), _tok(2, 0.4), _tok(3, 0.6)]
    b = [_tok(2, 0.4), _tok(3, 0.6), _tok(4, 0.8)]
    merged = merge_longest_contiguous(a, b, overlap_duration=0.5)
    ids = [t.id for t in merged]
    assert ids == [0, 1, 2, 3, 4]


def test_merge_lcs_fallback():
    a = [_tok(0, 0.0), _tok(1, 0.2), _tok(2, 0.4)]
    b = [_tok(1, 0.21), _tok(5, 0.3), _tok(2, 0.41), _tok(4, 0.6)]
    merged = merge_longest_common_subsequence(a, b, overlap_duration=0.5)
    ids = [t.id for t in merged]
    assert ids[0] == 0 and ids[-1] == 4


def test_sentences_split_on_punctuation():
    # "!" always ends a sentence; "." only when followed by a space token
    toks = [_tok(11, 0.0), _tok(13, 0.2), _tok(12, 0.4), _tok(10, 0.6)]
    # "!": sentence 1; "." followed by a space token: sentence 2; tail: 3
    sentences = tokens_to_sentences(toks)
    assert len(sentences) == 3
    assert sentences[0].text.endswith("!")


def test_batched_chunk_decode_matches_single():
    """The batched-chunk encoder pass must give each chunk the same tokens
    as decoding it alone (row independence of decode)."""
    import jax.numpy as jnp
    from mlx_audio_tpu.models.stt.parakeet.audio import log_mel_spectrogram

    model = BaseParakeet.from_config(ctc_config())
    rng = np.random.default_rng(7)
    a = rng.standard_normal(8000).astype(np.float32) * 0.1
    b = rng.standard_normal(8000).astype(np.float32) * 0.1
    mel_a = log_mel_spectrogram(a, model.preprocessor_config)
    mel_b = log_mel_spectrogram(b, model.preprocessor_config)
    batch = model.decode(jnp.concatenate([mel_a, mel_b], axis=0))
    singles = [model.decode(mel_a)[0], model.decode(mel_b)[0]]
    assert [r.text for r in batch] == [r.text for r in singles]


def _eager_transducer_oracle(model, features, max_length, tdt):
    """Reference-semantics greedy loop (parakeet.py:334-386 TDT,
    :435-482 RNNT) run eagerly over the same networks — an independent
    oracle for the jitted lax.while_loop."""
    import jax

    blank = len(model.vocabulary)
    durations = model.durations
    max_symbols = model.max_symbols
    h, c = model.decoder.init_state(1)
    last_token, use_emb = blank, False
    hyp = []
    time, new_symbols = 0, 0
    while time < max_length:
        feature = features[:, time]
        dec_out, (h2, c2) = model.decoder.step(
            jnp.asarray([last_token], jnp.int32), (h, c),
            jnp.asarray([use_emb]),
        )
        joint = np.asarray(model.joint(feature, dec_out)[0], np.float32)
        pred = int(joint[: blank + 1].argmax())
        if tdt:
            decision = int(joint[blank + 1:].argmax())
            dur = durations[decision]
        if pred != blank:
            hyp.append((pred, time, durations[decision] if tdt else 1))
            last_token, use_emb = pred, True
            h, c = h2, c2
        if tdt:
            time += dur
            new_symbols += 1
            if dur != 0:
                new_symbols = 0
            elif max_symbols is not None and max_symbols <= new_symbols:
                time += 1
                new_symbols = 0
        else:
            if pred != blank:
                new_symbols += 1
                if max_symbols is not None and max_symbols <= new_symbols:
                    time += 1
                    new_symbols = 0
            else:
                time += 1
                new_symbols = 0
    return hyp


@pytest.mark.parametrize("tdt", [True, False])
def test_transducer_while_loop_matches_eager_oracle(tdt):
    """The jitted lax.while_loop greedy decoders must emit exactly the
    tokens/times/durations of an eager re-implementation of the reference
    loop semantics (guards the emit/advance/max_symbols bookkeeping and
    the LSTM-state carry under the blank-vs-emit branches)."""
    from mlx_audio_tpu.models.stt.parakeet.parakeet import (
        _encode_jit,
        _transducer_greedy_loop,
    )

    cfg = tdt_config(tdt=tdt)
    if not tdt:
        cfg["model_defaults"] = {"tdt_durations": None}
    model = BaseParakeet.from_config(cfg)
    rng = np.random.default_rng(3)
    mel = rng.standard_normal((1, 120, 80)).astype(np.float32)
    features, lengths = _encode_jit(model, jnp.asarray(mel))
    max_len = int(lengths[0])

    toks, times, durs, count = _transducer_greedy_loop(
        model, features[:1], jnp.asarray([max_len], jnp.int32),
        jnp.asarray(model.durations, jnp.int32),
        vocab_size=len(model.vocabulary),
        max_symbols=int(model.max_symbols),
        max_out=max(16, (int(model.max_symbols) + 1) * max_len),
        tdt=tdt,
    )
    got = [(int(toks[0, i]), int(times[0, i]), int(durs[0, i]))
           for i in range(int(count[0]))]
    want = _eager_transducer_oracle(model, features, max_len, tdt)
    assert got == want
    assert len(want) > 0  # random weights must emit something non-trivial

    # batched rows must reproduce the single-row decode exactly (the loop
    # runs all rows in lockstep with per-row cursors)
    feats2 = jnp.concatenate([features[:1], features[:1]], axis=0)
    t2, tm2, d2, c2 = _transducer_greedy_loop(
        model, feats2, jnp.asarray([max_len, max_len], jnp.int32),
        jnp.asarray(model.durations, jnp.int32),
        vocab_size=len(model.vocabulary),
        max_symbols=int(model.max_symbols),
        max_out=max(16, (int(model.max_symbols) + 1) * max_len),
        tdt=tdt,
    )
    for row in range(2):
        got2 = [(int(t2[row, i]), int(tm2[row, i]), int(d2[row, i]))
                for i in range(int(c2[row]))]
        assert got2 == want


def test_ctc_collapse_keeps_repeats_across_blank():
    """NeMo CTC collapse semantics: [A, blank, A] must emit A twice (the
    reference's prev-token tracking silently dropped the second A)."""
    import jax.numpy as jnp
    from mlx_audio_tpu.models.stt.parakeet.parakeet import ParakeetCTC

    model = BaseParakeet.from_config(ctc_config())
    blank = len(VOCAB)
    frames = [0, blank, 0, 1, 1, blank, blank, 2]
    logits = np.full((1, len(frames), blank + 1), -10.0, dtype=np.float32)
    for t, tok in enumerate(frames):
        logits[0, t, tok] = 0.0

    import mlx_audio_tpu.models.stt.parakeet.parakeet as pk

    orig = pk._ctc_logits_jit
    pk._ctc_logits_jit = lambda m, mel: (jnp.asarray(logits),
                                         jnp.asarray([len(frames)]))
    try:
        res = model.decode(np.zeros((1, 10, 80), dtype=np.float32))[0]
    finally:
        pk._ctc_logits_jit = orig
    ids = [t.id for s in res.sentences for t in s.tokens]
    assert ids == [0, 0, 1, 2]
