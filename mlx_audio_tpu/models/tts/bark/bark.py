"""Bark — three-stage GPT TTS (text->semantic->coarse->fine) over EnCodec.

Capability parity with /root/reference/mlx_audio/tts/models/bark/
(bark.py:23-523, pipeline.py:16-442).  TPU execution plan: each stage's AR
loop is prefill + jitted `lax.scan` chunks with on-device restricted-vocab
sampling; the fine stage is batched non-causal forwards per codebook.
"""

from __future__ import annotations

import math
import os
import time
from dataclasses import dataclass
from functools import partial
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.models.base import BaseModelArgs, make_generation_result
from mlx_audio_tpu.models.tts.bark.gpt import GPT, FineGPT, GPTConfig
from mlx_audio_tpu.nn import Module

TEXT_ENCODING_OFFSET = 10_048
SEMANTIC_PAD_TOKEN = 10_000
TEXT_PAD_TOKEN = 129_595
SEMANTIC_INFER_TOKEN = 129_599
CONTEXT_WINDOW_SIZE = 1024
SEMANTIC_RATE_HZ = 49.9
SEMANTIC_VOCAB_SIZE = 10_000
CODEBOOK_SIZE = 1024
N_COARSE_CODEBOOKS = 2
N_FINE_CODEBOOKS = 8
COARSE_RATE_HZ = 75
COARSE_SEMANTIC_PAD_TOKEN = 12_048
COARSE_INFER_TOKEN = 12_050
SAMPLE_RATE = 24_000


def _null_cm():
    import contextlib

    return contextlib.nullcontext()


@dataclass
class ModelConfig(BaseModelArgs):
    semantic_config: dict = None
    coarse_acoustics_config: dict = None
    fine_acoustics_config: dict = None
    codec_config: dict = None
    model_type: str = "bark"
    model_size: str = "base"
    codec_path: str = "mlx-community/encodec-24khz-float32"
    sample_rate: int = 24000


# ---------------------------------------------------------------------------
# Jitted stage loops
# ---------------------------------------------------------------------------


def _cat_rows(key, logits, temperature):
    """Per-row keyed categorical over [B, ..., V]: row b draws with
    fold_in(key, b), so a row's sample is independent of the batch size
    (dp padding keeps real rows bit-exact)."""
    keys = jax.vmap(jax.random.fold_in, (None, 0))(
        key, jnp.arange(logits.shape[0]))
    return jax.vmap(
        lambda k, z: jax.random.categorical(k, z / temperature, axis=-1)
    )(keys, logits).astype(jnp.int32)


@partial(jax.jit, static_argnames=("max_steps", "temperature"))
def _semantic_prefill(model, encoded, hist, k0, max_steps: int,
                      temperature: float):
    """Jitted semantic-stage prefill: merged text+history embeddings +
    infer token -> (first sampled token [B], feed token [B], caches).
    One compiled graph per batch size (eager execution dispatched the
    whole prompt pass op-by-op over the device tunnel)."""
    emb = (model.semantic.input_embeds_layer(encoded)
           + model.semantic.input_embeds_layer(hist)[None])
    b = encoded.shape[0]
    infer = jnp.broadcast_to(
        model.semantic.input_embeds_layer(
            jnp.asarray([SEMANTIC_INFER_TOKEN]))[None],
        (b, 1, emb.shape[-1]),
    )
    prompt_emb = jnp.concatenate([emb, infer], axis=1)   # [B, 257, D]
    n = prompt_emb.shape[1]
    # KV cache follows the weight dtype (a f32 cache under bf16 weights
    # doubled the per-step HBM reads — the coarse stage was cache-read
    # bound, docs/PERF.md Bark section)
    caches = model.semantic.init_cache(
        b, n + max_steps, dtype=model.semantic.input_embeds_layer.weight.dtype)
    logits, caches = model.semantic.prefill(
        caches, prompt_emb, jnp.asarray(n, dtype=jnp.int32))
    relevant = jnp.concatenate(
        [logits.astype(jnp.float32)[:, :SEMANTIC_VOCAB_SIZE],
         logits.astype(jnp.float32)[
             :, SEMANTIC_PAD_TOKEN:SEMANTIC_PAD_TOKEN + 1]],
        axis=-1,
    )
    tok0 = _cat_rows(k0, relevant, temperature)
    feed = jnp.where(tok0 >= SEMANTIC_VOCAB_SIZE, SEMANTIC_PAD_TOKEN, tok0)
    return tok0, feed, caches


@partial(jax.jit, static_argnames=("chunk", "temperature"))
def _semantic_chunk(model, caches, last_token, key, chunk: int,
                    temperature: float):
    """Scan `chunk` semantic steps over a [B] row batch; sampled class
    10000 == early stop (emitted as SEMANTIC_VOCAB_SIZE, host truncates
    per row)."""

    def body(carry, k):
        caches_s, prev = carry
        logits, caches_s = model.semantic.step(caches_s, prev[:, None])
        logits = logits.astype(jnp.float32)
        relevant = jnp.concatenate(
            [logits[:, :SEMANTIC_VOCAB_SIZE],
             logits[:, SEMANTIC_PAD_TOKEN:SEMANTIC_PAD_TOKEN + 1]], axis=-1
        )
        tok = _cat_rows(k, relevant, temperature)
        # feed the pad token on (early-stop marker can't index embeddings OOB)
        feed = jnp.where(tok >= SEMANTIC_VOCAB_SIZE, SEMANTIC_PAD_TOKEN, tok)
        return (caches_s, feed), tok

    keys = jax.random.split(key, chunk)
    (caches, last), toks = jax.lax.scan(body, (caches, last_token), keys)
    return toks, caches, last


def _coarse_sample(k, logits, parity, temperature):
    """Sample one coarse token from the parity codebook's logit range."""
    start = SEMANTIC_VOCAB_SIZE + parity * CODEBOOK_SIZE
    v = logits.shape[-1]
    ids = jnp.arange(v)[None]
    masked = jnp.where((ids >= start) & (ids < start + CODEBOOK_SIZE),
                       logits, -jnp.inf)
    return _cat_rows(k, masked, temperature)


def _coarse_scan(model, caches, tok0, parity0, key, steps: int,
                 temperature: float):
    """steps-1 cached decode steps after an already-sampled tok0."""
    def body(carry, xs):
        caches_s, prev, parity = carry
        k = xs
        logits, caches_s = model.coarse_acoustics.step(caches_s, prev[:, None])
        parity = 1 - parity
        tok = _coarse_sample(k, logits.astype(jnp.float32), parity,
                             temperature)
        return (caches_s, tok, parity), tok

    keys = jax.random.split(key, steps - 1)
    (caches, _, _), toks = jax.lax.scan(body, (caches, tok0, parity0), keys)
    return jnp.concatenate([tok0[None], toks]), caches   # [steps, B]


@partial(jax.jit, static_argnames=("steps", "cache_len", "temperature"))
def _coarse_window(model, x_in, n_valid, parity0, key, steps: int,
                   cache_len: int, temperature: float):
    """One coarse sliding window over a [B, L] row batch: prefill the
    padded contexts (lockstep rows share n_valid) then scan `steps` token
    generations with alternating codebook logit ranges.  Returns the
    tokens and the caches (idx at n_valid + steps - 1; the final sampled
    token is NOT written — the next window feeds it, see
    _coarse_window_carry)."""
    b = x_in.shape[0]
    caches = model.coarse_acoustics.init_cache(
        b, cache_len,
        dtype=model.coarse_acoustics.input_embeds_layer.weight.dtype)
    emb = model.coarse_acoustics.input_embeds_layer(x_in)
    logits0, caches = model.coarse_acoustics.prefill(caches, emb, n_valid)

    key, k0 = jax.random.split(key)
    tok0 = _coarse_sample(k0, logits0.astype(jnp.float32), parity0,
                          temperature)                      # [B]
    return _coarse_scan(model, caches, tok0, parity0, key, steps, temperature)


@partial(jax.jit, static_argnames=("steps", "temperature"))
def _coarse_window_carry(model, caches, last_tok, parity0, key, steps: int,
                         temperature: float):
    """A sliding window whose context is exactly [previous window's context
    + its generated tokens]: skip the prefill and continue from the carried
    caches.  Holds while the semantic slice start is pinned at 0 and the
    coarse tail hasn't hit the max_coarse_history cap (the driver verifies
    the token rows byte-for-byte before taking this path), i.e. roughly the
    first max_coarse_history/sliding_window_len windows — Bark's learned
    absolute positions make a *general* shifted-window carry inexact, so
    later windows re-prefill (reference re-prefills EVERY window,
    bark/pipeline.py:210-350).

    Key schedule matches _coarse_window exactly (split -> k0 -> steps-1
    scan keys); the first logits come from one cached step on the window's
    final context token instead of the prefill's last-position row — the
    same math, so tokens match the prefill path to float rounding."""
    key, k0 = jax.random.split(key)
    logits0, caches = model.coarse_acoustics.step(caches, last_tok[:, None])
    tok0 = _coarse_sample(k0, logits0.astype(jnp.float32), parity0,
                          temperature)
    return _coarse_scan(model, caches, tok0, parity0, key, steps, temperature)


def _cache_bucket(n: int) -> int:
    """192-granular cache capacity (same bucketing as the window padding —
    bounds both the recompile count and the per-step cache-read width)."""
    return -(-n // 192) * 192


def _grow_caches(caches, new_len: int):
    """Extend each KVCache's capacity to new_len (pad with zeros past the
    write frontier; unwritten slots are masked by construction)."""
    cur = caches[0].k.shape[-2]
    if cur >= new_len:
        return caches
    pad = ((0, 0), (0, 0), (0, new_len - cur), (0, 0))
    return [
        c._replace(k=jnp.pad(c.k, pad), v=jnp.pad(c.v, pad)) for c in caches
    ]


@partial(jax.jit, static_argnames=("pred_idx", "temperature"))
def _fine_predict(model, in_buffer, rel_start, key, pred_idx: int,
                  temperature: Optional[float]):
    """in_buffer [B, 1024, 8], rel_start [B]: per-row window fill."""
    logits = model.fine_acoustics(pred_idx, in_buffer).astype(jnp.float32)
    relevant = logits[:, :, :CODEBOOK_SIZE]             # [B, T, V]
    if temperature is None:
        preds = jnp.argmax(relevant, axis=-1).astype(jnp.int32)
    else:
        preds = _cat_rows(key, relevant, temperature)
    # only positions >= rel_start are replaced (per row)
    t = in_buffer.shape[1]
    keep = jnp.arange(t)[None] < rel_start[:, None]     # [B, T]
    new_col = jnp.where(keep, in_buffer[:, :, pred_idx], preds)
    return in_buffer.at[:, :, pred_idx].set(new_col)


# ---------------------------------------------------------------------------


def _flatten_codebooks(arr: np.ndarray, offset_size: int = CODEBOOK_SIZE) -> np.ndarray:
    arr = arr.copy()
    for n in range(1, arr.shape[0]):
        arr[n, :] += offset_size * n
    return arr.T.reshape(-1)


def load_voice_prompt(voice_prompt_input):
    if isinstance(voice_prompt_input, str):
        return dict(np.load(voice_prompt_input))
    if isinstance(voice_prompt_input, dict):
        for k in ("semantic_prompt", "coarse_prompt", "fine_prompt"):
            assert k in voice_prompt_input
        return voice_prompt_input
    raise ValueError("voice prompt format unrecognized")


class Model(Module):
    def __init__(self, config: Union[ModelConfig, dict], codec=None,
                 tokenizer=None):
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        self.config = config
        self.semantic = GPT(GPTConfig.from_dict(config.semantic_config or {}))
        self.coarse_acoustics = GPT(
            GPTConfig.from_dict(config.coarse_acoustics_config or
                                {"input_vocab_size": 12096, "output_vocab_size": 12096})
        )
        self.fine_acoustics = FineGPT(
            GPTConfig.from_dict(config.fine_acoustics_config or
                                {"input_vocab_size": 1056, "output_vocab_size": 1056})
        )
        self._codec = codec
        if codec is None and isinstance(self.config.codec_config, dict):
            # HF suno/bark checkpoints embed the EnCodec (codec_model.*);
            # construct it so sanitize can route those weights in
            from mlx_audio_tpu.codec.encodec import Encodec, EncodecConfig

            self._codec = Encodec(
                EncodecConfig.from_dict(self.config.codec_config)
            )
        self._tokenizer = tokenizer

    @property
    def sample_rate(self):
        return self.config.sample_rate

    def _get_tokenizer(self):
        if self._tokenizer is None:
            from transformers import BertTokenizer

            self._tokenizer = BertTokenizer.from_pretrained(
                "bert-base-multilingual-cased"
            )
        return self._tokenizer

    def _get_codec(self):
        if self._codec is None:
            from mlx_audio_tpu.codec.encodec import Encodec

            # from_pretrained loads the WEIGHTS too (reference
            # pipeline.py:120); constructing from config alone would decode
            # through random parameters
            self._codec, _ = Encodec.from_pretrained(self.config.codec_path)
        return self._codec

    # -- stage drivers -----------------------------------------------------

    def generate_text_semantic(self, text: str, voice=None,
                               temperature: float = 0.7, seed: int = 0,
                               max_steps: int = 768) -> np.ndarray:
        return self.generate_text_semantic_batch(
            [text], voice, temperature, seed, max_steps)[0]

    def generate_text_semantic_batch(self, texts, voice=None,
                                     temperature: float = 0.7, seed: int = 0,
                                     max_steps: int = 768, dp=None) -> list:
        """Stage 1, batched: B text prompts -> per-row semantic tokens in
        one jitted AR loop (per-row early stop tracked on host)."""
        tokenizer = self._get_tokenizer()
        b = len(texts)
        rows = []
        for text in texts:
            encoded = np.asarray(
                tokenizer.encode(text, add_special_tokens=False)
            ) + TEXT_ENCODING_OFFSET
            encoded = encoded[:256]
            rows.append(np.pad(encoded, (0, 256 - len(encoded)),
                               constant_values=TEXT_PAD_TOKEN))
        encoded = np.stack(rows)                     # [B, 256]
        if voice is not None:
            hist = np.asarray(load_voice_prompt(voice)["semantic_prompt"])[-256:]
            hist = np.pad(hist, (0, 256 - len(hist)),
                          constant_values=SEMANTIC_PAD_TOKEN)
        else:
            hist = np.full(256, SEMANTIC_PAD_TOKEN)

        mesh_cm = dp.mesh if dp is not None else _null_cm()
        key = jax.random.PRNGKey(seed)
        key, k0 = jax.random.split(key)
        with mesh_cm:
            enc_dev = jnp.asarray(encoded)
            if dp is not None:
                enc_dev = dp.shard_batch(enc_dev)
            tok0, last, caches = _semantic_prefill(
                self, enc_dev, jnp.asarray(hist), k0,
                max_steps=max_steps, temperature=temperature,
            )
        tok0_np = np.asarray(tok0)
        out = [[] for _ in range(b)]
        done = tok0_np >= SEMANTIC_VOCAB_SIZE
        for i in range(b):
            if not done[i]:
                out[i].append(int(tok0_np[i]))
        produced = 1
        while produced < max_steps and not done.all():
            n_chunk = min(64, max_steps - produced)
            key, kc = jax.random.split(key)
            with mesh_cm:
                toks, caches, last = _semantic_chunk(
                    self, caches, last, kc, chunk=n_chunk,
                    temperature=temperature,
                )
            toks_np = np.asarray(toks)               # [n, B]
            for step in range(toks_np.shape[0]):
                for i in range(b):
                    if done[i]:
                        continue
                    t_ = int(toks_np[step, i])
                    if t_ >= SEMANTIC_VOCAB_SIZE:
                        done[i] = True
                    else:
                        out[i].append(t_)
            produced += toks_np.shape[0]
        return [np.asarray(o, dtype=np.int32) for o in out]

    def generate_coarse(self, x_semantic: np.ndarray, voice=None,
                        temperature: float = 0.7,
                        max_coarse_history: int = 630,
                        sliding_window_len: int = 60, seed: int = 0) -> np.ndarray:
        return self.generate_coarse_batch(
            [x_semantic], voice, temperature, max_coarse_history,
            sliding_window_len, seed)[0]

    def generate_coarse_batch(self, sems, voice=None,
                              temperature: float = 0.7,
                              max_coarse_history: int = 630,
                              sliding_window_len: int = 60, seed: int = 0,
                              dp=None) -> list:
        """Stage 2, batched: rows decode their sliding windows in lockstep
        (every window's context has the same length across rows, so the
        right-padded prefill shares one scalar n_valid); rows whose budget
        is exhausted keep stepping and are truncated to their own n_steps
        at the end."""
        ratio = COARSE_RATE_HZ / SEMANTIC_RATE_HZ * N_COARSE_CODEBOOKS
        max_semantic_history = int(math.floor(max_coarse_history / ratio))
        if voice is not None:
            vp = load_voice_prompt(voice)
            sem_hist = np.asarray(vp["semantic_prompt"])
            coarse_hist = _flatten_codebooks(
                np.asarray(vp["coarse_prompt"])
            ) + SEMANTIC_VOCAB_SIZE
            n_sem = min(max_semantic_history,
                        len(sem_hist) - len(sem_hist) % 2,
                        int(math.floor(len(coarse_hist) / ratio)))
            n_coarse = int(round(n_sem * ratio))
            sem_hist = sem_hist[-n_sem:].astype(np.int32)
            coarse_hist = coarse_hist[-n_coarse:].astype(np.int32)[:-2]
        else:
            sem_hist = np.zeros(0, dtype=np.int32)
            coarse_hist = np.zeros(0, dtype=np.int32)

        b = len(sems)
        n_steps = [
            int(round(math.floor(len(s) * ratio / N_COARSE_CODEBOOKS)
                      * N_COARSE_CODEBOOKS))
            for s in sems
        ]
        x_sem_rows = [np.concatenate([sem_hist, s]).astype(np.int32)
                      for s in sems]
        x_coarse_rows = [list(coarse_hist) for _ in range(b)]
        base_sem_idx = len(sem_hist)
        n_steps_max = max(n_steps)

        mesh_cm = dp.mesh if dp is not None else _null_cm()
        key = jax.random.PRNGKey(seed + 1)
        n_step = 0
        bucket = 257 + max_coarse_history
        # KV-carry across early windows: while the semantic slice start is
        # pinned at 0 and the coarse tail hasn't hit max_coarse_history,
        # the next window's context is [this context + the tokens just
        # generated], all at the SAME absolute positions — so its prefill
        # is already sitting in the caches.  carry = (caches, last token,
        # expected next-window token rows); verified byte-for-byte below.
        carry = None
        no_carry = bool(os.environ.get("MLX_AUDIO_TPU_NO_COARSE_CARRY"))
        while n_step < n_steps_max:
            sem_idx = base_sem_idx + int(round(n_step / ratio))
            rows = []
            clen = None
            for i in range(b):
                x_in = x_sem_rows[i][max(0, sem_idx - max_semantic_history):][:256]
                x_in = np.pad(x_in, (0, 256 - len(x_in)),
                              constant_values=COARSE_SEMANTIC_PAD_TOKEN)
                tail = np.asarray(x_coarse_rows[i][-max_coarse_history:],
                                  dtype=np.int32)
                ctx = np.concatenate(
                    [x_in, [COARSE_INFER_TOKEN], tail]).astype(np.int32)
                rows.append(ctx)
                clen = len(ctx)      # lockstep rows: identical every window
            steps = min(sliding_window_len, n_steps_max - n_step)
            # major steps (even n_step) sample codebook-0 logits [10000,11024)
            parity0 = 0 if (n_step % N_COARSE_CODEBOOKS == 0) else 1
            key, kw = jax.random.split(key)
            use_carry = (
                carry is not None
                and not no_carry
                and all(np.array_equal(rows[i], carry[2][i])
                        for i in range(b))
            )
            if use_carry:
                caches_in, last_tok = carry[0], carry[1]
                with mesh_cm:
                    # cache capacity must cover this window's steps too
                    caches_in = _grow_caches(
                        caches_in, _cache_bucket(clen + int(steps)))
                    toks, caches = _coarse_window_carry(
                        self, caches_in, last_tok,
                        jnp.asarray(parity0, jnp.int32), kw,
                        steps=int(steps), temperature=temperature,
                    )
            else:
                # context-length bucketing: early windows have a short
                # coarse tail (clen grows 257 -> 887); padding to a
                # 192-bucket instead of the fixed max cuts their prefill +
                # per-step cache reads ~3x.  Bit-exact (prefill masks by
                # n_valid; pad slots never attend) — same contract as the
                # Kokoro bucketing tests.
                wbucket = min(bucket, -(-clen // 192) * 192)
                padded = np.full((b, wbucket), COARSE_SEMANTIC_PAD_TOKEN,
                                 dtype=np.int32)
                for i in range(b):
                    padded[i, : len(rows[i])] = rows[i]
                with mesh_cm:
                    x_dev = jnp.asarray(padded)
                    if dp is not None:
                        x_dev = dp.shard_batch(x_dev)
                    toks, caches = _coarse_window(
                        self, x_dev, jnp.asarray(clen, jnp.int32),
                        jnp.asarray(parity0, jnp.int32), kw,
                        steps=int(steps),
                        cache_len=_cache_bucket(clen + int(steps)),
                        temperature=temperature,
                    )
            toks_np = np.asarray(toks)               # [steps, B]
            for i in range(b):
                x_coarse_rows[i].extend(int(t) for t in toks_np[:, i])
            carry = (caches, toks[-1],
                     [np.concatenate([rows[i], toks_np[:, i]])
                      for i in range(b)])
            n_step += int(steps)

        outs = []
        for i in range(b):
            gen = np.asarray(x_coarse_rows[i][len(coarse_hist):],
                             dtype=np.int32)[: n_steps[i]]
            gen = gen.reshape(-1, N_COARSE_CODEBOOKS).T - SEMANTIC_VOCAB_SIZE
            for n in range(1, N_COARSE_CODEBOOKS):
                gen[n, :] -= n * CODEBOOK_SIZE
            outs.append(gen)
        return outs

    def generate_fine(self, x_coarse_gen: np.ndarray,
                      temperature: Optional[float] = 0.7, seed: int = 0) -> np.ndarray:
        return self.generate_fine_batch([x_coarse_gen], temperature, seed)[0]

    def generate_fine_batch(self, coarse_list, temperature: Optional[float] = 0.7,
                            seed: int = 0, dp=None) -> list:
        """Stage 3, batched: rows pad to a shared length and fill their
        1024-wide non-causal windows together; per-row outputs truncate to
        each row's own coarse length."""
        b = len(coarse_list)
        n_coarse = coarse_list[0].shape[0]
        t_rows = [c.shape[1] for c in coarse_list]
        t_max = max(1024, max(t_rows))
        in_rows = []
        for c in coarse_list:
            arr = np.concatenate(
                [c, np.full((N_FINE_CODEBOOKS - n_coarse, c.shape[1]),
                            CODEBOOK_SIZE)], axis=0)
            if arr.shape[1] < t_max:
                arr = np.concatenate(
                    [arr, np.full((N_FINE_CODEBOOKS, t_max - arr.shape[1]),
                                  CODEBOOK_SIZE)], axis=1)
            in_rows.append(arr.T.astype(np.int32))   # [T, 8]
        in_arr = np.stack(in_rows)                   # [B, T, 8]
        n_loops = max(0, int(math.ceil((t_max - 1024) / 512))) + 1
        mesh_cm = dp.mesh if dp is not None else _null_cm()
        key = jax.random.PRNGKey(seed + 2)
        for n in range(n_loops):
            start_idx = min(n * 512, t_max - 1024)
            start_fill_idx = min(n * 512, t_max - 512)
            rel_start = start_fill_idx - start_idx
            with mesh_cm:
                buf = jnp.asarray(in_arr[:, start_idx: start_idx + 1024])
                rel = jnp.full((b,), rel_start, dtype=jnp.int32)
                if dp is not None:
                    buf, rel = dp.shard_batch(buf, rel)
                for nn in range(n_coarse, N_FINE_CODEBOOKS):
                    key, kf = jax.random.split(key)
                    buf = _fine_predict(self, buf, rel, kf, pred_idx=nn,
                                        temperature=temperature)
            buf_np = np.asarray(buf)
            in_arr[:, start_fill_idx: start_idx + 1024] = buf_np[:, rel_start:]
        return [in_arr[i].T[:, : t_rows[i]] for i in range(b)]

    def codec_decode(self, fine_tokens: np.ndarray) -> np.ndarray:
        """EnCodec decode of [8, T] fine tokens -> [1, samples]."""
        codec = self._get_codec()
        codes = jnp.asarray(fine_tokens, dtype=jnp.int32)[None, None]  # [1,1,8,T]
        audio = codec.decode(codes, [None])
        return np.asarray(audio)[:, :, 0]

    def generate(self, text: str, voice=None, temperature: float = 0.7,
                 seed: int = 0, **kwargs):
        yield self.generate_batch([text], voice=voice,
                                  temperature=temperature, seed=seed)[0]

    def generate_batch(self, texts, voice=None, temperature: float = 0.7,
                       seed: int = 0, **kwargs) -> list:
        """Batched three-stage synthesis: B texts run each GPT stage in one
        jitted batch loop (per-row early stop / step budgets tracked on
        host).  Under an active mesh with dp > 1 the batch pads to a dp
        multiple and every stage shards its rows over 'data' with the
        weights replicated; per-row fold_in sampling keys keep real rows
        exact vs the unsharded run.  EnCodec decode batches equal-length
        rows into one codec call.  New capability vs the reference
        (strictly single-text, bark.py:393)."""
        from mlx_audio_tpu.parallel.context import active_mesh

        start = time.perf_counter()
        b = len(texts)
        ctx = active_mesh()
        dp = ctx if (ctx is not None and ctx.dp > 1 and b > 1) else None
        run_texts = list(texts)
        if dp is not None:
            while len(run_texts) % dp.dp:
                run_texts.append(run_texts[-1])

        target = dp.place_replicated(self) if dp is not None else self
        sems = target.generate_text_semantic_batch(
            run_texts, voice, temperature, seed,
            max_steps=kwargs.get("max_steps", 768), dp=dp)
        coarse = target.generate_coarse_batch(
            sems, voice, temperature, seed=seed, dp=dp)
        fines = target.generate_fine_batch(
            coarse, temperature, seed=seed, dp=dp)
        elapsed = time.perf_counter() - start
        # EnCodec decode: rows with equal fine lengths batch into ONE
        # codec call (exact — same ops, stacked); ragged rows fall into
        # per-length groups
        audios = {}
        groups = {}
        for i in range(b):
            if fines[i].shape[1] == 0:
                audios[i] = np.zeros((0,), dtype=np.float32)
            else:
                groups.setdefault(fines[i].shape[1], []).append(i)
        codec = self._get_codec()
        for _, idxs in groups.items():
            codes = jnp.asarray(
                np.stack([fines[i] for i in idxs]), dtype=jnp.int32
            )[None]                                     # [1, G, 8, T]
            wavs = np.asarray(codec.decode(codes, [None]))  # [G, T, C]
            for row, i in enumerate(idxs):
                audios[i] = wavs[row, :, 0]
        results = []
        for i in range(b):
            results.append(make_generation_result(
                audios[i], self.config.sample_rate, i, int(len(sems[i])),
                elapsed / b,
            ))
        return results

    def sanitize(self, weights: dict) -> dict:
        out = {}
        codec_weights = {}
        for k, v in weights.items():
            k = k.replace("_orig_mod.transformer.", "").replace("_orig_mod.", "")
            # GPT2-style h.N. -> layers.N.
            import re

            k = re.sub(r"(^|\.)h\.(\d+)\.", r"\1layers.\2.", k)
            if k.startswith("codec_model."):
                codec_weights[k[len("codec_model."):]] = np.asarray(v)
                continue
            if "codec" in k:
                continue
            if k.endswith(".attn.bias"):
                continue  # registered causal-mask buffer, not a parameter
            out[k] = np.asarray(v)
        if codec_weights and self._codec is not None:
            from mlx_audio_tpu.codec.encodec import sanitize_hf_encodec

            out.update({f"_codec.{k}": v for k, v in
                        sanitize_hf_encodec(codec_weights).items()})
        return out
