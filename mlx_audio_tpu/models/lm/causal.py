"""Generic causal-LM wrapper + jitted chunked token generation.

The reference delegates LLM-over-audio-token decoding to mlx_lm's
stream_generate (tts/models/llama/llama.py:238-258, outetts, spark); here
it is one shared TPU-first loop: left-padded prefill buckets + `lax.scan`
decode chunks with on-device sampling and repetition penalty, reused by
Orpheus, OuteTTS, Spark and the CSM backbone family.
"""

from __future__ import annotations

import contextlib
from dataclasses import dataclass
from functools import partial
from typing import Callable, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.models.lm.llama import LlamaConfig, LlamaModel
from mlx_audio_tpu.models.sampling import sample_top_k_rows, sample_top_p_rows
from mlx_audio_tpu.nn import Linear, Module


class LlamaForCausalLM(Module):
    """LlamaModel + LM head (tied embeddings supported)."""

    def __init__(self, config: LlamaConfig):
        self.config = config
        self.model = LlamaModel(config)
        self.tie_word_embeddings = config.tie_word_embeddings
        if not config.tie_word_embeddings:
            self.lm_head = Linear(config.hidden_size, config.vocab_size, bias=False)

    def logits(self, hidden: jax.Array) -> jax.Array:
        if self.tie_word_embeddings:
            return self.model.embed_tokens.as_linear(hidden)
        return self.lm_head(hidden)

    def __call__(self, input_ids: jax.Array) -> jax.Array:
        return self.logits(self.model(input_ids))


def _bucket(n: int, step: int = 64) -> int:
    return max(step, -(-n // step) * step)


@partial(jax.jit, static_argnames=("temp", "top_k", "top_p", "rep_penalty",
                                   "rep_context", "chunk"))
def _decode_chunk(model, caches, pad_len, last_token, rep_window, key,
                  temp: float, top_k: int, top_p: float, rep_penalty: float,
                  rep_context: int, chunk: int):
    """Generate `chunk` tokens via lax.scan.

    rep_window: [B, rep_context] rolling buffer of recent tokens (-1 = empty).
    Returns (tokens [chunk, B], caches, rep_window, last_token).
    """

    def sample(k, logits):
        # per-row keys: a row's draw is independent of batch size, so dp
        # padding keeps real rows bit-exact vs the unpadded run
        if temp == 0:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        if top_p < 1.0:
            return sample_top_p_rows(k, logits, temp, top_p)
        return sample_top_k_rows(k, logits, temp, top_k)

    def body(carry, k):
        caches_s, prev, window = carry
        h, caches_s = model.model.step(caches_s, prev[:, None], pad_len)
        logits = model.logits(h[:, -1]).astype(jnp.float32)
        if rep_penalty != 1.0:
            v = logits.shape[-1]
            hist = jnp.where(window < 0, v, window)
            onehot = (jax.nn.one_hot(hist, v + 1, dtype=jnp.bool_)).any(axis=1)[:, :v]
            penalized = jnp.where(logits > 0, logits / rep_penalty,
                                  logits * rep_penalty)
            logits = jnp.where(onehot, penalized, logits)
        tok = sample(k, logits)
        window = jnp.concatenate([window[:, 1:], tok[:, None]], axis=1)
        return (caches_s, tok, window), tok

    keys = jax.random.split(key, chunk)
    (caches, last, rep_window), toks = jax.lax.scan(
        body, (caches, last_token, rep_window), keys
    )
    return toks, caches, rep_window, last


@partial(jax.jit, static_argnames=())
def _prefill(model, caches, pad_len, input_ids):
    h, caches = model.model.prefill(caches, input_ids, pad_len)
    logits = model.logits(h[:, -1]).astype(jnp.float32)
    return logits, caches


def _sample_first(key, logits, temperature, top_k, top_p):
    if temperature == 0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if top_p < 1.0:
        return sample_top_p_rows(key, logits, temperature, top_p)
    return sample_top_k_rows(key, logits, temperature, top_k)


def _dp_context():
    """(ctx | None): the active mesh when its data axis can shard a batch."""
    from mlx_audio_tpu.parallel.context import active_mesh

    ctx = active_mesh()
    return ctx if (ctx is not None and ctx.dp > 1) else None


def _placement(model):
    """(run_model, mesh_cm, dp): the model to decode with, a context manager
    to run jitted steps under, and the mesh context when its data axis can
    shard the batch (else None).  With tp > 1 the Llama weights shard by
    tp_rules_llama over 'model' (cached per model) — this one hook tensor-
    parallelizes every causal-LM family (Orpheus, OuteTTS, Spark, ChatLM,
    and Voxtral's LM, which is Llama-class); dp composes on top, batch over
    'data', exactly as the CSM backbone does (sesame/model.py
    _decode_placement)."""
    import contextlib

    from mlx_audio_tpu.parallel.context import active_mesh
    from mlx_audio_tpu.parallel.mesh import tp_rules_llama

    ctx = active_mesh()
    dp = ctx if (ctx is not None and ctx.dp > 1) else None
    if ctx is not None and ctx.tp > 1:
        return ctx.place_tp(model, tp_rules_llama), ctx.mesh, dp
    if dp is not None:
        return dp.place_replicated(model), dp.mesh, dp
    return model, contextlib.nullcontext(), None


def lm_dtype(model) -> jnp.dtype:
    """Activation/cache dtype: first floating leaf (robust to quantized
    modules whose `weight` is uint8)."""
    for leaf in jax.tree_util.tree_leaves(model):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.dtype
    return jnp.float32


def generate_tokens_batch(
    model: LlamaForCausalLM,
    prompts: List[np.ndarray],
    max_tokens: int = 1200,
    temperature: float = 0.6,
    top_k: int = 0,
    top_p: float = 1.0,
    repetition_penalty: float = 1.0,
    repetition_context_size: int = 20,
    stop_tokens: tuple = (),
    chunk: int = 64,
    seed: int = 0,
    max_cache_len: Optional[int] = None,
) -> List[np.ndarray]:
    """Batched decode: B prompts share every weight fetch (the loop is
    HBM-bound, so throughput scales near-linearly in B — docs/PERF.md).
    Per-sequence stop tokens are tracked on host between chunks; finished
    rows keep stepping until all stop or the budget runs out.  Returns the
    generated tokens (stop token excluded) per prompt.

    Under an active mesh with dp > 1 the batch is padded to a dp multiple
    and sharded over the 'data' axis with the weights replicated — one
    change that data-parallelizes every causal-LM family (Orpheus, OuteTTS,
    Spark, ChatLM).  Per-row sampling keys keep real rows bit-exact vs the
    unsharded run (the reference's whole TTS surface is the capability
    being scaled, /root/reference/mlx_audio/tts/generate.py:203; the
    reference itself is single-device, SURVEY.md §2.5)."""
    b = len(prompts)
    prompts = [np.asarray(p).reshape(-1) for p in prompts]
    bucket = _bucket(max(len(p) for p in prompts))
    prompt = np.zeros((b, bucket), dtype=np.int32)
    pad = np.zeros((b,), dtype=np.int32)
    for i, p in enumerate(prompts):
        pad[i] = bucket - len(p)
        prompt[i, pad[i]:] = p

    run_model, mesh_cm, dp = _placement(model)
    if dp is not None:
        from mlx_audio_tpu.parallel.context import pad_batch_arrays

        prompt, pad, _ = pad_batch_arrays(dp, prompt, pad)
    bn = prompt.shape[0]                     # dp-padded batch

    cache_len = max_cache_len or (bucket + max_tokens)
    caches = run_model.model.init_cache(bn, max_len=cache_len,
                                        dtype=lm_dtype(model))
    pad_len = jnp.asarray(pad)
    prompt_j = jnp.asarray(prompt)
    rep_window = np.full((bn, max(repetition_context_size, 1)), -1,
                         dtype=np.int32)
    if dp is not None:
        caches = dp.shard_batch_tree(caches, bn)
        prompt_j, pad_len = dp.shard_batch(prompt_j, pad_len)
    key = jax.random.PRNGKey(seed)

    with mesh_cm:
        logits, caches = _prefill(run_model, caches, pad_len, prompt_j)
        key, k0 = jax.random.split(key)
        first = _sample_first(k0, logits, temperature, top_k, top_p)
    first_np = np.asarray(first)

    out = [[] for _ in range(b)]
    done = np.zeros((b,), dtype=bool)
    for i in range(b):
        if int(first_np[i]) in stop_tokens:
            done[i] = True
        else:
            out[i].append(int(first_np[i]))

    rep_window[:, -1] = first_np
    rep_window = jnp.asarray(rep_window)
    if dp is not None:
        rep_window = dp.shard_batch(rep_window)
    last = first
    produced = 1
    while produced < max_tokens and not done.all():
        n = min(chunk, max_tokens - produced)
        key, kc = jax.random.split(key)
        with mesh_cm:
            toks, caches, rep_window, last = _decode_chunk(
                run_model, caches, pad_len, last, rep_window, kc,
                temp=temperature, top_k=top_k, top_p=top_p,
                rep_penalty=repetition_penalty,
                rep_context=max(repetition_context_size, 1), chunk=n,
            )
        toks_np = np.asarray(toks)          # [n, Bn]
        for step in range(toks_np.shape[0]):
            for i in range(b):
                if done[i]:
                    continue
                tok = int(toks_np[step, i])
                if tok in stop_tokens:
                    done[i] = True
                else:
                    out[i].append(tok)
        produced += toks_np.shape[0]
    return [np.asarray(o, dtype=np.int32) for o in out]


def generate_tokens(
    model: LlamaForCausalLM,
    input_ids: np.ndarray,
    max_tokens: int = 1200,
    temperature: float = 0.6,
    top_k: int = 0,
    top_p: float = 1.0,
    repetition_penalty: float = 1.0,
    repetition_context_size: int = 20,
    stop_tokens: tuple = (),
    chunk: int = 64,
    seed: int = 0,
    max_cache_len: Optional[int] = None,
) -> Iterator[np.ndarray]:
    """Yield generated token chunks (np.int32 [<=chunk]) for a single prompt
    [T] until a stop token or the budget; host checks stops per chunk."""
    input_ids = np.asarray(input_ids).reshape(-1)
    t = len(input_ids)
    bucket = _bucket(t)
    pad = bucket - t
    prompt = np.full((1, bucket), 0, dtype=np.int32)
    prompt[0, pad:] = input_ids
    pad_len = jnp.asarray([pad], dtype=jnp.int32)

    cache_len = max_cache_len or (bucket + max_tokens)
    model, mesh_cm, _ = _placement(model)
    caches = model.model.init_cache(1, max_len=cache_len, dtype=lm_dtype(model))
    key = jax.random.PRNGKey(seed)

    with mesh_cm:
        logits, caches = _prefill(model, caches, pad_len, jnp.asarray(prompt))
        key, k0 = jax.random.split(key)
        first = _sample_first(k0, logits, temperature, top_k, top_p)
    first_np = int(np.asarray(first)[0])
    if first_np in stop_tokens:
        return
    yield np.asarray([first_np], dtype=np.int32)

    rep_window = np.full((1, max(repetition_context_size, 1)), -1, dtype=np.int32)
    rep_window[0, -1] = first_np
    rep_window = jnp.asarray(rep_window)
    last = first
    produced = 1
    while produced < max_tokens:
        n = min(chunk, max_tokens - produced)
        key, kc = jax.random.split(key)
        with mesh_cm:
            toks, caches, rep_window, last = _decode_chunk(
                model, caches, pad_len, last, rep_window, kc,
                temp=temperature, top_k=top_k, top_p=top_p,
                rep_penalty=repetition_penalty,
                rep_context=max(repetition_context_size, 1), chunk=n,
            )
        toks_np = np.asarray(toks)[:, 0]
        out = []
        done = False
        for tok in toks_np:
            if int(tok) in stop_tokens:
                done = True
                break
            out.append(int(tok))
        if out:
            yield np.asarray(out, dtype=np.int32)
        produced += len(out)
        if done or len(out) < len(toks_np):
            return
