"""Whisper decoding: jitted greedy / sampling loops, vectorized logit
filters, language ID — plus the real batched beam search the reference
declares but does not implement (decoding.py:436-437).

TPU-first structure vs the reference (decoding.py:398-707):

* The per-window token loop is a `lax.while_loop` over fixed-size token
  buffers with functional KV caches — one compile per (prompt-bucket).
* The timestamp rules (reference ApplyTimestampRules, decoding.py:325-395,
  which loop over Python lists per step) are fully vectorized over the
  batch.  NB the reference port diverges from original Whisper semantics
  (it masks by token *indices*); we follow the original (token values).
* Beam search keeps [n_audio, beam] state on device, reindexes the KV
  caches with gathers, and finishes when every audio has `beam_size`
  completed candidates (original Whisper semantics incl. patience).
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field, replace
from functools import partial
from typing import Dict, Iterable, List, NamedTuple, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.models.stt.whisper.audio import CHUNK_LENGTH


def compression_ratio(text: str) -> float:
    text_bytes = text.encode("utf-8")
    return len(text_bytes) / len(zlib.compress(text_bytes))


@dataclass(frozen=True)
class DecodingOptions:
    task: str = "transcribe"
    language: Optional[str] = None
    temperature: float = 0.0
    sample_len: Optional[int] = None
    best_of: Optional[int] = None
    beam_size: Optional[int] = None
    patience: Optional[float] = None
    length_penalty: Optional[float] = None
    prompt: Optional[Union[str, List[int]]] = None
    prefix: Optional[Union[str, List[int]]] = None
    suppress_tokens: Optional[Union[str, Iterable[int]]] = "-1"
    suppress_blank: bool = True
    without_timestamps: bool = False
    max_initial_timestamp: Optional[float] = 1.0
    fp16: bool = False
    # additive per-token logit bias applied at every decode step
    # ({token_id: bias}); steers decoding (e.g. encourage/penalize EOT or
    # domain tokens) — applied inside the jitted loops at no extra cost
    logit_bias: Optional[Dict[int, float]] = None
    # scripted per-audio finish lengths (tokens after sample_begin): row i is
    # FORCED to emit EOT once it has decoded eot_cutoff[i] tokens.  A bench/
    # test instrument: random weights never EOT, so this is the only way to
    # exercise staggered finishes (greedy early-exit, beam retirement) with
    # a deterministic length profile (VERDICT r4 #7)
    eot_cutoff: Optional[List[int]] = None
    # disable finished-audio compaction in beam search (control arm for the
    # retirement bench; results must be identical either way)
    beam_compact: bool = True


@dataclass(frozen=True)
class DecodingResult:
    audio_features: Optional[jax.Array]
    language: str
    language_probs: Optional[Dict[str, float]] = None
    tokens: List[int] = field(default_factory=list)
    text: str = ""
    avg_logprob: float = np.nan
    no_speech_prob: float = np.nan
    temperature: float = np.nan
    compression_ratio: float = np.nan


# ---------------------------------------------------------------------------
# Vectorized logit filters
# ---------------------------------------------------------------------------


class FilterConfig(NamedTuple):
    """Hashable (static) constants driving the in-graph logit filters; the
    suppress/blank masks travel separately as device arrays."""

    eot: int
    timestamp_begin: int
    no_timestamps: int
    max_initial_timestamp_index: int  # -1 disables
    apply_timestamp_rules: bool


def apply_filters(logits: jax.Array, tokens: jax.Array, t: jax.Array,
                  sample_begin: jax.Array, p: FilterConfig,
                  suppress_mask: jax.Array, blank_mask: jax.Array) -> jax.Array:
    """logits [B, V]; tokens [B, L] buffer with valid length t."""
    v = logits.shape[-1]
    logits = logits + suppress_mask
    at_start = t == sample_begin
    logits = jnp.where(at_start, logits + blank_mask, logits)

    if not p.apply_timestamp_rules:
        return logits

    ts_begin = p.timestamp_begin
    vocab_ids = jnp.arange(v)[None, :]

    # suppress <|notimestamps|>
    logits = jnp.where(vocab_ids == p.no_timestamps, -jnp.inf, logits)

    b, l = tokens.shape
    pos = jnp.arange(l)[None, :]
    in_seq = (pos >= sample_begin) & (pos < t)

    last = jnp.take_along_axis(
        tokens, jnp.maximum(t - 1, 0)[None, None].repeat(b, 0), axis=1
    )[:, 0]
    penult = jnp.take_along_axis(
        tokens, jnp.maximum(t - 2, 0)[None, None].repeat(b, 0), axis=1
    )[:, 0]
    seq_len = t - sample_begin
    last_was_ts = (seq_len >= 1) & (last >= ts_begin)
    penult_was_ts = (seq_len < 2) | (penult >= ts_begin)

    # timestamps come in pairs except before EOT
    force_text = last_was_ts & penult_was_ts        # next must be non-timestamp
    force_ts_or_eot = last_was_ts & ~penult_was_ts  # next can't be normal text
    logits = jnp.where(
        force_text[:, None] & (vocab_ids >= ts_begin), -jnp.inf, logits
    )
    logits = jnp.where(
        force_ts_or_eot[:, None] & (vocab_ids < p.eot), -jnp.inf, logits
    )

    # timestamps must be non-decreasing (original Whisper semantics: mask
    # strictly below the last emitted timestamp token value, +1 when it must
    # advance)
    ts_tokens = jnp.where(in_seq & (tokens >= ts_begin), tokens, -1)
    last_ts_val = jnp.max(ts_tokens, axis=1)  # -1 if none
    has_ts = last_ts_val >= 0
    bump = (~last_was_ts) | penult_was_ts
    floor = last_ts_val + bump.astype(last_ts_val.dtype)
    logits = jnp.where(
        (has_ts[:, None]) & (vocab_ids >= ts_begin) & (vocab_ids < floor[:, None]),
        -jnp.inf, logits,
    )

    # at the very beginning: only timestamps, bounded by max_initial_timestamp
    start_mask = (vocab_ids < ts_begin)
    if p.max_initial_timestamp_index >= 0:
        start_mask = start_mask | (
            vocab_ids > ts_begin + p.max_initial_timestamp_index
        )
    logits = jnp.where(at_start & start_mask, -jnp.inf, logits)

    # if total timestamp probability beats the best text token, force timestamp
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    ts_logprob = jax.nn.logsumexp(logprobs[:, ts_begin:], axis=-1, keepdims=True)
    max_text = jnp.max(logprobs[:, :ts_begin], axis=-1, keepdims=True)
    logits = jnp.where(
        (ts_logprob > max_text) & (vocab_ids < ts_begin), -jnp.inf, logits
    )
    return logits


# ---------------------------------------------------------------------------
# Greedy / sampling loop
# ---------------------------------------------------------------------------


def _force_eot(logits, force_rows, eot):
    """Override filtered logits with a one-hot EOT distribution on forced
    rows (the eot_cutoff instrument — bypasses any -inf the filters put on
    EOT so the scheduled length always wins)."""
    v = logits.shape[-1]
    forced = jnp.where(jnp.arange(v)[None, :] == eot, 0.0, -1e30)
    return jnp.where(force_rows[:, None], forced, logits)


@partial(jax.jit, static_argnames=("sample_len", "temperature", "params"))
def greedy_decode_loop(model, caches, cross_kv, tokens_buf, t0, sample_begin,
                       key, suppress_mask, blank_mask, sample_len: int,
                       temperature: float, params: FilterConfig,
                       eot_cutoff=None):
    """tokens_buf [B, L] with prompt in [0, t0); decodes until EOT/limit.

    Returns (tokens_buf, lengths [B], sum_logprobs [B]).
    """
    b, l = tokens_buf.shape
    eot = params.eot

    def cond(state):
        t, _, _, finished, _, _ = state
        return (t < t0 + sample_len) & (t < l) & ~jnp.all(finished)

    def body(state):
        t, tokens, caches_s, finished, sum_lp, k = state
        last = jnp.take_along_axis(tokens, (t - 1)[None, None].repeat(b, 0), axis=1)
        logits, caches_s = model.decoder.step(caches_s, last, cross_kv)
        logits = logits.astype(jnp.float32)
        logits = apply_filters(logits, tokens, t, sample_begin, params,
                               suppress_mask, blank_mask)
        if eot_cutoff is not None:
            logits = _force_eot(logits, (t - sample_begin) >= eot_cutoff, eot)
        if temperature == 0:
            next_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            k, sub = jax.random.split(k)
            next_tok = jax.random.categorical(sub, logits / temperature, axis=-1).astype(jnp.int32)
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        cur_lp = jnp.take_along_axis(logprobs, next_tok[:, None], axis=1)[:, 0]
        sum_lp = sum_lp + jnp.where(finished, 0.0, cur_lp)
        next_tok = jnp.where(finished, eot, next_tok)
        tokens = jax.lax.dynamic_update_slice(tokens, next_tok[:, None], (0, t))
        finished = finished | (next_tok == eot)
        return (t + 1, tokens, caches_s, finished, sum_lp, k)

    finished0 = jnp.zeros((b,), dtype=bool)
    sum_lp0 = jnp.zeros((b,), dtype=jnp.float32)
    t_end, tokens, caches, finished, sum_lp, _ = jax.lax.while_loop(
        cond, body, (t0, tokens_buf, caches, finished0, sum_lp0, key)
    )
    return tokens, t_end, sum_lp


# ---------------------------------------------------------------------------
# Beam search (new capability vs the reference)
# ---------------------------------------------------------------------------


def _iter_top_k(x: jax.Array, k: int):
    """Exact top-k of each row by k (argmax, mask) passes — bandwidth-bound
    and ~4x faster than lax.top_k's sort network for small k over
    100k-class rows (measured: 0.95 vs 3.85 ms/step at [4, 259330], k=10;
    scripts/probe_beam_topk.py).  Values match lax.top_k exactly; ties
    break by lowest index."""
    rows = x.shape[0]
    vals, idxs = [], []
    for _ in range(k):
        i = jnp.argmax(x, axis=-1)
        vals.append(jnp.take_along_axis(x, i[:, None], axis=-1)[:, 0])
        idxs.append(i)
        x = x.at[jnp.arange(rows), i].set(-jnp.inf)
    return jnp.stack(vals, -1), jnp.stack(idxs, -1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("chunk", "beam_size", "params",
                                   "patience"))
def _beam_chunk(model, caches, cross_kv, tokens_buf, origins, alive_scores,
                fin_tokens, fin_len, fin_scores, n_done, t_in, budget_end,
                n_ret0, sample_begin, suppress_mask, blank_mask, chunk: int,
                beam_size: int, params: FilterConfig, patience: float,
                eot_cutoff=None):
    """Beam steps over [n_audio * beam] rows until a RETIREMENT EVENT
    (full state in, full state out — the host loop around it retires and
    compacts finished audios between calls).

    The loop exits when the number of fully-finished audios exceeds
    `n_ret0` (the count at entry), the budget runs out, or `chunk` steps
    elapse (a dispatch-size safeguard).  When nothing finishes this is
    ONE dispatch for the whole decode — the host pays a queue-drain sync
    only when there is actually something to compact.

    Per-audio freeze: once an audio has n_cand finished candidates its
    pool stops updating (HF early_stopping=True / original Whisper
    max_candidates semantics) — which is what makes compacting it out of
    the batch exact."""
    ab, l = tokens_buf.shape
    k_beam = beam_size
    n_cand = max(k_beam, int(round(k_beam * (patience or 1.0))))
    a = ab // k_beam
    eot = params.eot
    neg = jnp.float32(-1e30)

    def cond(state):
        t, steps, _, _, _, _, _, _, _, n_done = state
        n_ret = jnp.sum(n_done >= n_cand)
        return ((t < budget_end) & (t < l) & (steps < chunk)
                & (n_ret <= n_ret0) & (n_ret < a))

    def body(state):
        (t, steps, tokens, caches_s, origins, alive_scores, fin_tokens,
         fin_len, fin_scores, n_done) = state
        was_done = n_done >= n_cand
        last = jnp.take_along_axis(tokens, (t - 1)[None, None].repeat(ab, 0), axis=1)
        # position t-1's K/V is written by each CURRENT row for itself this
        # step — record that before the lazy-gather attention read
        origins = jax.lax.dynamic_update_slice(
            origins, jnp.arange(ab, dtype=jnp.int32)[:, None], (0, t - 1))
        logits, caches_s = model.decoder.step(caches_s, last, cross_kv,
                                              origins=origins)
        logits = logits.astype(jnp.float32)
        logits = apply_filters(logits, tokens, t, sample_begin, params,
                               suppress_mask, blank_mask)
        if eot_cutoff is not None:
            # per-AUDIO schedule: every beam of a forced audio goes EOT, so
            # its candidate pool fills (and it retires) at the scripted step
            logits = _force_eot(
                logits,
                jnp.repeat((t - sample_begin) >= eot_cutoff, k_beam), eot)
        logprobs = jax.nn.log_softmax(logits, axis=-1)  # [A*K, V]
        v = logprobs.shape[-1]
        cand = alive_scores.reshape(ab, 1) + logprobs  # [A*K, V]
        cand = cand.reshape(a, k_beam * v)

        # take top 2K candidates so we can both harvest EOT finishes and
        # refill K alive beams.  Iterative argmax+mask, NOT lax.top_k:
        # at K*V ~ 260k the top_k sort network alone cost ~3.9 ms/step —
        # the ENTIRE rest of the beam step — while 2K bandwidth-bound
        # argmax passes cost 0.9 ms with bit-identical values
        # (scripts/probe_beam_topk.py)
        top_scores, top_idx = _iter_top_k(cand, 2 * k_beam)
        src_beam = top_idx // v            # [A, 2K]
        tok = (top_idx % v).astype(jnp.int32)

        is_eot = tok == eot
        # --- finished harvest: merge EOT candidates into the finished set
        # (audios whose pool was already full at step start are frozen)
        eot_scores = jnp.where(is_eot & ~was_done[:, None], top_scores,
                               neg)  # [A, 2K]
        # candidate finished sequences: tokens of src beam + eot at t
        merged_scores = jnp.concatenate([fin_scores, eot_scores], axis=1)  # [A, Kc+2K]
        keep_scores, keep_idx = jax.lax.top_k(merged_scores, n_cand)
        # build the merged token/length pools
        src_tokens = jnp.take_along_axis(
            tokens.reshape(a, k_beam, l), src_beam[..., None], axis=1
        )  # [A, 2K, L]
        cand_tokens = jnp.where(
            jnp.arange(l)[None, None, :] == t, tok[..., None], src_tokens
        )
        cand_len = jnp.broadcast_to((t + 1)[None, None], (a, 2 * k_beam))
        pool_tokens = jnp.concatenate([fin_tokens, cand_tokens], axis=1)
        pool_len = jnp.concatenate([fin_len, cand_len], axis=1)
        fin_tokens = jnp.take_along_axis(pool_tokens, keep_idx[..., None], axis=1)
        fin_len = jnp.take_along_axis(pool_len, keep_idx, axis=1)
        fin_scores = keep_scores
        n_done = jnp.sum(fin_scores > neg / 2, axis=1)

        # --- alive refill: best K non-EOT candidates
        alive_cand = jnp.where(is_eot, neg, top_scores)
        new_scores, alive_idx = jax.lax.top_k(alive_cand, k_beam)  # [A, K]
        new_src = jnp.take_along_axis(src_beam, alive_idx, axis=1)
        new_tok = jnp.take_along_axis(tok, alive_idx, axis=1)
        new_tokens = jnp.take_along_axis(
            tokens.reshape(a, k_beam, l), new_src[..., None], axis=1
        )
        new_tokens = jnp.where(
            jnp.arange(l)[None, None, :] == t, new_tok[..., None], new_tokens
        ).reshape(ab, l)
        # lazy beam reorder: compose the [AB, L] origin map instead of
        # physically copying the whole KV cache (VERDICT r2 #3 — the
        # per-step reorder moved ~2x the cache per step; attention now
        # gathers rows at read time, reading the same bytes it always did)
        flat_src = (jnp.arange(a)[:, None] * k_beam + new_src).reshape(-1)
        origins = jnp.take(origins, flat_src, axis=0)

        return (t + 1, steps + 1, new_tokens, caches_s, origins, new_scores,
                fin_tokens, fin_len, fin_scores, n_done)

    state = (t_in, jnp.zeros((), jnp.int32), tokens_buf, caches, origins,
             alive_scores, fin_tokens, fin_len, fin_scores, n_done)
    out = jax.lax.while_loop(cond, body, state)
    (t_end, _steps, tokens, caches, origins, alive_scores, fin_tokens,
     fin_len, fin_scores, n_done) = out
    return (t_end, tokens, caches, origins, alive_scores, fin_tokens,
            fin_len, fin_scores, n_done)


def _pow2_bucket(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def beam_search_loop(model, caches, cross_kv, tokens_buf, t0, sample_begin,
                     suppress_mask, blank_mask, sample_len: int,
                     beam_size: int, params: FilterConfig,
                     patience: float = 1.0, chunk: int = 100_000,
                     eot_cutoff=None, compact: bool = True):
    """Batched beam search over [n_audio * beam] rows with finished-audio
    compaction (docs/PERF.md beam roofline: the cost IS the rows).

    tokens_buf/caches/cross_kv are already tiled to n_audio*beam rows with
    identical prompts per audio.  ``patience`` keeps searching until
    round(beam * patience) candidates finish per audio (original Whisper
    BeamSearchDecoder semantics; its pool freezes once full — HF
    early_stopping=True).  The jitted loop runs in `chunk`-step pieces;
    between pieces, audios whose pools are full RETIRE: their candidates
    move to host and the remaining rows re-gather into the next
    power-of-two audio bucket, so late finishers stop paying for early
    ones.  Candidate sets are step-for-step identical to the unchunked
    loop (freeze makes retirement exact; the golden HF beam-parity test
    gates it).  Returns (finished_tokens [A, Kc, L], finished_lengths
    [A, Kc], finished_scores [A, Kc]) as numpy, in input audio order.
    """
    ab, l = tokens_buf.shape
    k_beam = beam_size
    n_cand = max(k_beam, int(round(k_beam * (patience or 1.0))))
    a = ab // k_beam
    eot = params.eot
    neg = np.float32(-1e30)
    t0i = int(np.asarray(t0))
    budget_end = jnp.asarray(min(t0i + sample_len, l), jnp.int32)

    # alive beams: scores; first step must only expand beam 0 (all beams
    # are identical after prefill), so initialize others to -inf.
    alive_scores = jnp.tile(
        jnp.concatenate(
            [jnp.zeros((1,)), jnp.full((k_beam - 1,), neg)])[None, :],
        (a, 1),
    )
    fin_tokens = jnp.zeros((a, n_cand, l), dtype=tokens_buf.dtype)
    fin_len = jnp.zeros((a, n_cand), dtype=jnp.int32)
    fin_scores = jnp.full((a, n_cand), neg)
    n_done = jnp.zeros((a,), dtype=jnp.int32)
    origins = jnp.broadcast_to(
        jnp.arange(ab, dtype=jnp.int32)[:, None],
        (ab, caches[0].k.shape[-2]),
    )
    tokens = tokens_buf
    t = jnp.asarray(t0i, jnp.int32)

    out_tokens = np.zeros((a, n_cand, l), dtype=np.int32)
    out_len = np.zeros((a, n_cand), dtype=np.int32)
    out_scores = np.full((a, n_cand), neg, dtype=np.float32)
    live = np.arange(a)          # original audio index per current row-group

    n_ret0 = 0
    while True:
        (t, tokens, caches, origins, alive_scores, fin_tokens, fin_len,
         fin_scores, n_done) = _beam_chunk(
            model, caches, cross_kv, tokens, origins, alive_scores,
            fin_tokens, fin_len, fin_scores, n_done, t, budget_end,
            jnp.asarray(n_ret0, jnp.int32), sample_begin, suppress_mask,
            blank_mask, chunk=chunk, beam_size=k_beam, params=params,
            patience=patience, eot_cutoff=eot_cutoff,
        )
        # ONE host transfer per event (each fetch is a full queue-drain
        # round trip on the tunneled runtime — separate np.asarray calls
        # here cost ~100 ms each)
        t_now, n_done_np = jax.device_get((t, n_done))
        done = n_done_np >= n_cand
        exhausted = int(t_now) >= min(t0i + sample_len, l)
        if exhausted or done.all():
            break
        # retire finished audios (their pools are frozen: exact), keep the
        # rest, re-bucketed to the next power of two to bound recompiles
        n_live = int((~done).sum())
        bucket = _pow2_bucket(n_live)
        if not compact or bucket >= len(done):
            # nothing would shrink: raise the event threshold so the next
            # dispatch runs until ANOTHER audio finishes
            n_ret0 = int(done.sum())
            continue
        ft, fl, fs = jax.device_get((fin_tokens, fin_len, fin_scores))
        for local in np.nonzero(done)[0]:
            orig = live[local]
            if orig < 0:          # a pad slot from an earlier compaction
                continue
            out_tokens[orig] = ft[local]
            out_len[orig] = fl[local]
            out_scores[orig] = fs[local]
        keep = list(np.nonzero(~done)[0])
        pad_src = int(np.nonzero(done)[0][0])   # frozen filler audio
        sel = np.asarray(keep + [pad_src] * (bucket - n_live), np.int32)
        live = live[sel[:]]                     # pads map to a retired
        live = np.where(np.arange(bucket) < n_live, live, -1)
        rows_np = (sel[:, None] * k_beam
                   + np.arange(k_beam)[None, :]).reshape(-1)
        rows = jnp.asarray(rows_np)
        sel_j = jnp.asarray(sel)
        take_a = lambda x: jnp.take(x, sel_j, axis=0)
        take_r = lambda x: jnp.take(x, rows, axis=0)
        tokens = take_r(tokens)
        # origin VALUES index cache rows, which take_r just moved: remap
        # old row ids -> new row ids or attention gathers stale rows after
        # a compaction (caught by the eot_cutoff staggered-finish test —
        # duplicate pad rows keep the last mapping, which only pads see)
        remap = np.zeros((int(origins.shape[0]),), np.int32)
        remap[rows_np] = np.arange(len(rows_np), dtype=np.int32)
        origins = jnp.asarray(remap)[take_r(origins)]
        caches = [c._replace(k=take_r(c.k), v=take_r(c.v)) for c in caches]
        cross_kv = [(take_r(ck), take_r(cv)) for ck, cv in cross_kv]
        alive_scores = take_a(alive_scores)
        fin_tokens = take_a(fin_tokens)
        fin_len = take_a(fin_len)
        fin_scores = take_a(fin_scores)
        n_done = take_a(n_done)
        if eot_cutoff is not None:
            eot_cutoff = take_a(eot_cutoff)
        # pads are retired fillers: the next event is a NEW finisher
        n_ret0 = bucket - n_live

    # final harvest + backfill: audios still in flight take their best
    # alive beams, truncated at t_end with a forced EOT (per-slot, same as
    # the single-shot loop did)
    t_np, ft, fl, fs, toks, asc = jax.device_get(
        (t, fin_tokens, fin_len, fin_scores, tokens, alive_scores))
    t_end = int(t_np)
    toks = toks.reshape(len(fs), k_beam, l)
    alive_tokens = toks.copy()
    if t_end < l:
        alive_tokens[:, :, t_end] = eot
    pad_n = n_cand - k_beam
    alive_tokens = np.pad(alive_tokens, ((0, 0), (0, pad_n), (0, 0)),
                          constant_values=eot)
    asc = np.pad(asc, ((0, 0), (0, pad_n)), constant_values=neg)
    need = fs <= neg / 2
    ft = np.where(need[..., None], alive_tokens, ft)
    fl = np.where(need, t_end + 1, fl)
    fs = np.where(need, asc, fs)
    for local, orig in enumerate(live):
        if orig < 0:
            continue
        out_tokens[orig] = ft[local]
        out_len[orig] = fl[local]
        out_scores[orig] = fs[local]
    return out_tokens, out_len, out_scores
