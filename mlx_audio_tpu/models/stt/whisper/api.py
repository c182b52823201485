"""Whisper decoding API: `decode()` (greedy / sampling / beam) and
`detect_language()` — host glue around the jitted loops in decoding.py.

Mirrors the contract of reference DecodingTask.run (decoding.py:618-707).
"""

from __future__ import annotations

from dataclasses import replace
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.models.stt.whisper.decoding import (
    DecodingOptions,
    DecodingResult,
    FilterConfig,
    beam_search_loop,
    compression_ratio,
    greedy_decode_loop,
)
from mlx_audio_tpu.models.stt.whisper.audio import CHUNK_LENGTH
from mlx_audio_tpu.models.stt.whisper.tokenizer import Tokenizer, get_tokenizer

_SAMPLE_LEN_CAP = 224  # n_text_ctx // 2 (reference decoding.py:419)


@jax.jit
def _encode_mel(model, mel):
    # mel follows the model's weight dtype: a bf16-cast model runs the
    # whole encoder (and downstream decode: features/caches/cross-kv) bf16
    return model.encoder(mel.astype(model.encoder.conv1.weight.dtype))


@jax.jit
def _prefill_jit(model, caches, cross_kv, tokens, n_valid, sot_index):
    h, caches = model.decoder.prefill(caches, tokens, n_valid, cross_kv)
    b = tokens.shape[0]
    h_sot = h[jnp.arange(b), sot_index]
    sot_logits = model.decoder.token_embedding.as_linear(h_sot)
    return sot_logits.astype(jnp.float32), caches


@jax.jit
def _lang_id_jit(model, features, sot_token, lang_token_ids):
    b = features.shape[0]
    tokens = jnp.full((b, 1), sot_token, dtype=jnp.int32)
    logits = model.decoder.full_forward(tokens, features)[:, 0].astype(jnp.float32)
    v = logits.shape[-1]
    mask = jnp.full((v,), -jnp.inf).at[lang_token_ids].set(0.0)
    logits = logits + mask
    return jnp.argmax(logits, axis=-1), jax.nn.softmax(logits, axis=-1)


def detect_language(model, mel_or_features, tokenizer: Optional[Tokenizer] = None):
    """Language ID from the first window (reference decoding.py:20-79)."""
    if tokenizer is None:
        tokenizer = get_tokenizer(model.is_multilingual,
                                  num_languages=model.num_languages)
    single = mel_or_features.ndim == 2
    x = mel_or_features[None] if single else mel_or_features
    if x.shape[-2:] != (model.dims.n_audio_ctx, model.dims.n_audio_state):
        x = _encode_mel(model, x)
    lang_tokens, probs = _lang_id_jit(
        model, x, tokenizer.sot, jnp.asarray(tokenizer.all_language_tokens)
    )
    probs = np.asarray(probs)
    language_probs = [
        {
            c: float(probs[i, j])
            for j, c in zip(tokenizer.all_language_tokens, tokenizer.all_language_codes)
        }
        for i in range(x.shape[0])
    ]
    if single:
        return lang_tokens[0], language_probs[0]
    return lang_tokens, language_probs


def _initial_tokens(tokenizer: Tokenizer, options: DecodingOptions,
                    n_ctx: int, sample_len: int) -> tuple:
    sot_sequence = tokenizer.sot_sequence
    if options.without_timestamps:
        sot_sequence = tokenizer.sot_sequence_including_notimestamps
    tokens = list(sot_sequence)
    if options.prefix:
        prefix_tokens = (
            tokenizer.encode(" " + options.prefix.strip())
            if isinstance(options.prefix, str) else list(options.prefix)
        )
        if sample_len is not None:
            max_prefix_len = n_ctx // 2 - sample_len
            prefix_tokens = prefix_tokens[-max_prefix_len:]
        tokens = tokens + prefix_tokens
    if options.prompt:
        prompt_tokens = (
            tokenizer.encode(" " + options.prompt.strip())
            if isinstance(options.prompt, str) else list(options.prompt)
        )
        tokens = (
            [tokenizer.sot_prev] + prompt_tokens[-(n_ctx // 2 - 1):] + tokens
        )
    return tuple(tokens)


def _suppress_token_list(tokenizer: Tokenizer, options: DecodingOptions) -> tuple:
    st = options.suppress_tokens
    if isinstance(st, str):
        st = [int(t) for t in st.split(",")] if st else []
    st = list(st or [])
    if -1 in st:
        st = [t for t in st if t >= 0]
        st.extend(tokenizer.non_speech_tokens)
    st.extend([tokenizer.transcribe, tokenizer.translate, tokenizer.sot,
               tokenizer.sot_prev, tokenizer.sot_lm])
    if tokenizer.no_speech is not None:
        st.append(tokenizer.no_speech)
    return tuple(sorted(set(st)))


def _bucket(n: int, step: int = 32) -> int:
    return max(step, -(-n // step) * step)


def decode(
    model,
    mel,
    options: DecodingOptions = DecodingOptions(),
    tokenizer: Optional[Tokenizer] = None,
    **kwargs,
) -> Union[DecodingResult, List[DecodingResult]]:
    """Decode 30 s mel window(s) [A?, 3000, n_mels] (NLC) or precomputed
    audio features.

    Batched windows are embarrassingly parallel (SURVEY.md §2.5(e)): under
    an active mesh with dp > 1 the window batch is sharded over the 'data'
    axis (padded to a dp multiple by repeating the last window; padded rows
    are dropped) and the weights replicate, so XLA partitions the already-
    jitted encode/decode loops across devices."""
    from mlx_audio_tpu.parallel.context import active_mesh

    ctx = active_mesh()
    if ctx is not None and ctx.dp > 1 and getattr(mel, "ndim", 2) == 3 \
            and mel.shape[0] > 1:
        mel, n = ctx.pad_batch(jnp.asarray(mel))
        placed = ctx.place_replicated(model)
        with ctx.mesh:
            results = _decode_impl(placed, ctx.shard_batch(mel), options,
                                   tokenizer, **kwargs)
        return results[:n]
    return _decode_impl(model, mel, options, tokenizer, **kwargs)


def _decode_impl(
    model,
    mel,
    options: DecodingOptions = DecodingOptions(),
    tokenizer: Optional[Tokenizer] = None,
    **kwargs,
) -> Union[DecodingResult, List[DecodingResult]]:
    if kwargs:
        options = replace(options, **kwargs)
    single = mel.ndim == 2
    if single:
        mel = mel[None]

    if options.beam_size is not None and options.best_of is not None:
        raise ValueError("beam_size and best_of can't be given together")
    if options.temperature == 0 and options.best_of is not None:
        raise ValueError("best_of with greedy sampling (T=0) is not compatible")
    if options.patience is not None and options.beam_size is None:
        raise ValueError("patience requires beam_size to be given")

    language = options.language or "en"
    if tokenizer is None:
        tokenizer = get_tokenizer(
            model.is_multilingual, num_languages=model.num_languages,
            language=language, task=options.task,
        )

    n_audio = mel.shape[0]
    n_ctx = model.dims.n_text_ctx
    sample_len = min(options.sample_len or n_ctx // 2, _SAMPLE_LEN_CAP)

    if mel.shape[-2:] == (model.dims.n_audio_ctx, model.dims.n_audio_state):
        features = jnp.asarray(mel)
    else:
        features = _encode_mel(model, jnp.asarray(mel, dtype=jnp.float32))

    # language detection per audio if not specified
    languages = [language] * n_audio
    language_probs = [None] * n_audio
    initial = list(_initial_tokens(tokenizer, options, n_ctx, sample_len))
    sot_index = initial.index(tokenizer.sot)
    if options.language is None or options.task == "lang_id":
        lang_tokens, language_probs = detect_language(model, features, tokenizer)
        languages = [max(p, key=p.get) for p in np.atleast_1d(language_probs)]
        if options.task == "lang_id":
            return [
                DecodingResult(audio_features=features[i], language=languages[i],
                               language_probs=language_probs[i])
                for i in range(n_audio)
            ]

    n_init = len(initial)
    bucket = _bucket(n_init)
    sample_begin = n_init

    cfg = FilterConfig(
        eot=tokenizer.eot,
        timestamp_begin=tokenizer.timestamp_begin,
        no_timestamps=tokenizer.no_timestamps,
        max_initial_timestamp_index=(
            round(options.max_initial_timestamp / (CHUNK_LENGTH / model.dims.n_audio_ctx))
            if options.max_initial_timestamp else -1
        ),
        apply_timestamp_rules=not options.without_timestamps,
    )
    n_vocab = model.dims.n_vocab
    suppress_mask = np.zeros((n_vocab,), np.float32)
    if options.suppress_tokens:
        suppress_mask[list(_suppress_token_list(tokenizer, options))] = -np.inf
    blank_mask = np.zeros((n_vocab,), np.float32)
    if options.suppress_blank:
        blank_mask[tokenizer.encode(" ") + [tokenizer.eot]] = -np.inf
    if options.logit_bias:
        for tid, bias in options.logit_bias.items():
            suppress_mask[int(tid)] += float(bias)
    suppress_mask = jnp.asarray(suppress_mask)
    blank_mask = jnp.asarray(blank_mask)

    n_group = options.beam_size or options.best_of or 1
    buf_len = bucket + sample_len + 1

    # token buffer, right-padded prompt
    tokens0 = np.full((n_audio, buf_len), tokenizer.eot, dtype=np.int32)
    for i in range(n_audio):
        row = list(initial)
        if options.language is None:
            row[sot_index + 1] = int(np.asarray(lang_tokens).reshape(-1)[i])
        tokens0[i, :n_init] = row
    tokens0 = jnp.asarray(tokens0)

    cross_kv = model.decoder.compute_cross_kv(features)
    caches = model.decoder.init_cache(n_audio, buf_len, dtype=features.dtype)
    sot_logits, caches = _prefill_jit(
        model, caches, cross_kv, tokens0[:, :bucket],
        jnp.asarray(n_init, dtype=jnp.int32), sot_index,
    )
    if tokenizer.no_speech is not None:
        no_speech_probs = np.asarray(
            jax.nn.softmax(sot_logits, axis=-1)[:, tokenizer.no_speech]
        )
    else:
        no_speech_probs = np.full(n_audio, np.nan)

    t0 = jnp.asarray(n_init, dtype=jnp.int32)
    sb = jnp.asarray(sample_begin, dtype=jnp.int32)

    cutoff = None
    if options.eot_cutoff is not None:
        cutoff = jnp.asarray(options.eot_cutoff, jnp.int32)
        assert cutoff.shape == (n_audio,), "eot_cutoff must be per-audio"

    if options.beam_size is not None:
        k = options.beam_size
        tile = lambda x: jnp.repeat(x, k, axis=0)
        caches_b = [c._replace(k=tile(c.k), v=tile(c.v)) for c in caches]
        cross_b = [(tile(ck), tile(cv)) for ck, cv in cross_kv]
        tokens_b = tile(tokens0)
        fin_tokens, fin_len, fin_scores = beam_search_loop(
            model, caches_b, cross_b, tokens_b, t0, sb, suppress_mask,
            blank_mask, sample_len=sample_len, beam_size=k, params=cfg,
            patience=float(options.patience or 1.0),
            eot_cutoff=cutoff, compact=options.beam_compact,
        )
        group_tokens = np.asarray(fin_tokens)       # [A, K, L]
        group_len = np.asarray(fin_len)
        group_lp = np.asarray(fin_scores)
    else:
        reps = n_group
        if reps > 1:  # best-of-n sampling
            tile = lambda x: jnp.repeat(x, reps, axis=0)
            caches = [c._replace(k=tile(c.k), v=tile(c.v)) for c in caches]
            cross_kv = [(tile(ck), tile(cv)) for ck, cv in cross_kv]
            tokens0 = tile(tokens0)
        toks, t_end, sum_lp = greedy_decode_loop(
            model, caches, cross_kv, tokens0, t0, sb,
            jax.random.PRNGKey(0),
            suppress_mask, blank_mask, sample_len=sample_len,
            temperature=options.temperature, params=cfg,
            eot_cutoff=(jnp.repeat(cutoff, reps) if cutoff is not None
                        else None),
        )
        group_tokens = np.asarray(toks).reshape(n_audio, reps, -1)
        group_len = np.full((n_audio, reps), int(t_end))
        group_lp = np.asarray(sum_lp).reshape(n_audio, reps)

    # host-side finalize: slice sample region, cut at EOT, rank
    results = []
    for i in range(n_audio):
        cand_tokens, cand_lp = [], []
        for g in range(group_tokens.shape[1]):
            seq = group_tokens[i, g, sample_begin: group_len[i, g]].tolist()
            if tokenizer.eot in seq:
                seq = seq[: seq.index(tokenizer.eot)]
            cand_tokens.append(seq)
            cand_lp.append(float(group_lp[i, g]))
        # rank with length penalty (reference MaximumLikelihoodRanker)
        def score(lp, length):
            if options.length_penalty is None:
                penalty = max(length, 1)
            else:
                penalty = ((5 + length) / 6) ** options.length_penalty
            return lp / penalty
        sel = int(np.argmax([score(lp, len(t)) for lp, t in zip(cand_lp, cand_tokens)]))
        tokens_i = cand_tokens[sel]
        text = tokenizer.decode(tokens_i).strip()
        sum_lp_i = cand_lp[sel]
        results.append(
            DecodingResult(
                audio_features=features[i],
                language=languages[i],
                language_probs=language_probs[i] if options.language is None else None,
                tokens=tokens_i,
                text=text,
                avg_logprob=sum_lp_i / (len(tokens_i) + 1),
                no_speech_prob=float(no_speech_probs[i]),
                temperature=options.temperature,
                compression_ratio=compression_ratio(text),
            )
        )
    return results[0] if single else results
