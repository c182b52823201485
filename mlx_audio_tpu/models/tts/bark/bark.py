"""Bark — three-stage GPT TTS (text->semantic->coarse->fine) over EnCodec.

Capability parity with /root/reference/mlx_audio/tts/models/bark/
(bark.py:23-523, pipeline.py:16-442).  TPU execution plan: each stage's AR
loop is prefill + jitted `lax.scan` chunks with on-device restricted-vocab
sampling; the fine stage is batched non-causal forwards per codebook.
"""

from __future__ import annotations

import math
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


@partial(jax.jit, static_argnames=("chunk", "temperature"))
def _semantic_chunk(model, caches, last_token, key, chunk: int,
                    temperature: float):
    """Scan `chunk` semantic steps; sampled class 10000 == early stop
    (emitted as SEMANTIC_VOCAB_SIZE, host truncates)."""

    def body(carry, k):
        caches_s, prev = carry
        logits, caches_s = model.semantic.step(caches_s, prev[:, None])
        logits = logits.astype(jnp.float32)
        relevant = jnp.concatenate(
            [logits[:, :SEMANTIC_VOCAB_SIZE],
             logits[:, SEMANTIC_PAD_TOKEN:SEMANTIC_PAD_TOKEN + 1]], axis=-1
        )
        tok = jax.random.categorical(k, relevant / temperature, axis=-1).astype(jnp.int32)
        # feed the pad token on (early-stop marker can't index embeddings OOB)
        feed = jnp.where(tok >= SEMANTIC_VOCAB_SIZE, SEMANTIC_PAD_TOKEN, tok)
        return (caches_s, feed), tok

    keys = jax.random.split(key, chunk)
    (caches, last), toks = jax.lax.scan(body, (caches, last_token), keys)
    return toks, caches, last


@partial(jax.jit, static_argnames=("steps", "temperature"))
def _coarse_window(model, x_in, n_valid, parity0, key, steps: int,
                   temperature: float):
    """One coarse sliding window: prefill the padded context then scan
    `steps` token generations with alternating codebook logit ranges."""
    caches = model.coarse_acoustics.init_cache(1, x_in.shape[1] + steps)
    emb = model.coarse_acoustics.input_embeds_layer(x_in)
    logits0, caches = model.coarse_acoustics.prefill(caches, emb, n_valid)

    def sample(k, logits, parity):
        start = SEMANTIC_VOCAB_SIZE + parity * CODEBOOK_SIZE
        v = logits.shape[-1]
        ids = jnp.arange(v)
        masked = jnp.where((ids >= start) & (ids < start + CODEBOOK_SIZE),
                           logits, -jnp.inf)
        return jax.random.categorical(k, masked / temperature, axis=-1).astype(jnp.int32)

    key, k0 = jax.random.split(key)
    tok0 = sample(k0, logits0.astype(jnp.float32)[0], parity0)

    def body(carry, xs):
        caches_s, prev, parity = carry
        k = xs
        logits, caches_s = model.coarse_acoustics.step(caches_s, prev[None, None])
        parity = 1 - parity
        tok = sample(k, logits.astype(jnp.float32)[0], parity)
        return (caches_s, tok, parity), tok

    keys = jax.random.split(key, steps - 1)
    (caches, _, _), toks = jax.lax.scan(body, (caches, tok0, parity0), keys)
    return jnp.concatenate([tok0[None], toks])


@partial(jax.jit, static_argnames=("pred_idx", "temperature"))
def _fine_predict(model, in_buffer, rel_start, key, pred_idx: int,
                  temperature: Optional[float]):
    logits = model.fine_acoustics(pred_idx, in_buffer).astype(jnp.float32)
    relevant = logits[0, :, :CODEBOOK_SIZE]
    if temperature is None:
        preds = jnp.argmax(relevant, axis=-1).astype(jnp.int32)
    else:
        preds = jax.random.categorical(
            key, relevant / temperature, axis=-1
        ).astype(jnp.int32)
    # only positions >= rel_start are replaced
    t = in_buffer.shape[1]
    keep = jnp.arange(t) < rel_start
    new_col = jnp.where(keep, in_buffer[0, :, pred_idx], preds)
    return in_buffer.at[0, :, pred_idx].set(new_col)


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
        tokenizer = self._get_tokenizer()
        encoded = np.asarray(
            tokenizer.encode(text, add_special_tokens=False)
        ) + TEXT_ENCODING_OFFSET
        encoded = encoded[:256]
        encoded = np.pad(encoded, (0, 256 - len(encoded)),
                         constant_values=TEXT_PAD_TOKEN)
        if voice is not None:
            hist = np.asarray(load_voice_prompt(voice)["semantic_prompt"])[-256:]
            hist = np.pad(hist, (0, 256 - len(hist)),
                          constant_values=SEMANTIC_PAD_TOKEN)
        else:
            hist = np.full(256, SEMANTIC_PAD_TOKEN)

        # merged context: emb(text) + emb(history), then the infer token
        emb = (
            self.semantic.input_embeds_layer(jnp.asarray(encoded)[None])
            + self.semantic.input_embeds_layer(jnp.asarray(hist)[None])
        )
        infer = self.semantic.input_embeds_layer(
            jnp.asarray([[SEMANTIC_INFER_TOKEN]])
        )
        prompt_emb = jnp.concatenate([emb, infer], axis=1)  # [1, 257, D]
        n = prompt_emb.shape[1]

        caches = self.semantic.init_cache(1, n + max_steps)
        logits, caches = self.semantic.prefill(
            caches, prompt_emb, jnp.asarray(n, dtype=jnp.int32)
        )
        key = jax.random.PRNGKey(seed)
        key, k0 = jax.random.split(key)
        relevant = jnp.concatenate(
            [logits.astype(jnp.float32)[:, :SEMANTIC_VOCAB_SIZE],
             logits.astype(jnp.float32)[:, SEMANTIC_PAD_TOKEN:SEMANTIC_PAD_TOKEN + 1]],
            axis=-1,
        )
        tok0 = int(np.asarray(
            jax.random.categorical(k0, relevant / temperature, axis=-1)
        )[0])
        out = []
        if tok0 >= SEMANTIC_VOCAB_SIZE:
            return np.asarray(out, dtype=np.int32)
        out.append(tok0)
        last = jnp.asarray([tok0], dtype=jnp.int32)
        while len(out) < max_steps:
            n_chunk = min(64, max_steps - len(out))
            key, kc = jax.random.split(key)
            toks, caches, last = _semantic_chunk(
                self, caches, last, kc, chunk=n_chunk, temperature=temperature
            )
            stop = False
            for t_ in np.asarray(toks)[:, 0]:
                if int(t_) >= SEMANTIC_VOCAB_SIZE:
                    stop = True
                    break
                out.append(int(t_))
            if stop or n_chunk < 64:
                break
        return np.asarray(out, dtype=np.int32)

    def generate_coarse(self, x_semantic: np.ndarray, voice=None,
                        temperature: float = 0.7,
                        max_coarse_history: int = 630,
                        sliding_window_len: int = 60, seed: int = 0) -> np.ndarray:
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

        n_steps = int(round(
            math.floor(len(x_semantic) * ratio / N_COARSE_CODEBOOKS)
            * N_COARSE_CODEBOOKS
        ))
        x_sem = np.concatenate([sem_hist, x_semantic]).astype(np.int32)
        x_coarse = list(coarse_hist)
        base_sem_idx = len(sem_hist)

        key = jax.random.PRNGKey(seed + 1)
        n_step = 0
        n_windows = int(round(n_steps / sliding_window_len))
        for _ in range(max(n_windows, 1)):
            if n_step >= n_steps:
                break
            sem_idx = base_sem_idx + int(round(n_step / ratio))
            x_in = x_sem[max(0, sem_idx - max_semantic_history):][:256]
            x_in = np.pad(x_in, (0, 256 - len(x_in)),
                          constant_values=COARSE_SEMANTIC_PAD_TOKEN)
            tail = np.asarray(x_coarse[-max_coarse_history:], dtype=np.int32)
            ctx = np.concatenate([x_in, [COARSE_INFER_TOKEN], tail]).astype(np.int32)
            bucket = 257 + max_coarse_history
            padded = np.full(bucket, COARSE_SEMANTIC_PAD_TOKEN, dtype=np.int32)
            padded[: len(ctx)] = ctx
            steps = min(sliding_window_len, n_steps - n_step)
            # major steps (even n_step) sample codebook-0 logits [10000,11024)
            parity0 = 0 if (n_step % N_COARSE_CODEBOOKS == 0) else 1
            key, kw = jax.random.split(key)
            toks = _coarse_window(
                self, jnp.asarray(padded)[None], jnp.asarray(len(ctx), jnp.int32),
                jnp.asarray(parity0, jnp.int32), kw, steps=int(steps),
                temperature=temperature,
            )
            x_coarse.extend(int(t) for t in np.asarray(toks))
            n_step += int(steps)

        gen = np.asarray(x_coarse[len(coarse_hist):], dtype=np.int32)
        gen = gen.reshape(-1, N_COARSE_CODEBOOKS).T - SEMANTIC_VOCAB_SIZE
        for n in range(1, N_COARSE_CODEBOOKS):
            gen[n, :] -= n * CODEBOOK_SIZE
        return gen

    def generate_fine(self, x_coarse_gen: np.ndarray,
                      temperature: Optional[float] = 0.7, seed: int = 0) -> np.ndarray:
        n_coarse = x_coarse_gen.shape[0]
        in_arr = np.concatenate(
            [x_coarse_gen,
             np.full((N_FINE_CODEBOOKS - n_coarse, x_coarse_gen.shape[1]),
                     CODEBOOK_SIZE)], axis=0,
        )
        n_remove = 0
        if in_arr.shape[1] < 1024:
            n_remove = 1024 - in_arr.shape[1]
            in_arr = np.concatenate(
                [in_arr, np.full((N_FINE_CODEBOOKS, n_remove), CODEBOOK_SIZE)],
                axis=1,
            )
        n_loops = max(0, int(math.ceil((x_coarse_gen.shape[1] - 1024) / 512))) + 1
        in_arr = in_arr.T.astype(np.int32)  # [T, 8]
        key = jax.random.PRNGKey(seed + 2)
        for n in range(n_loops):
            start_idx = min(n * 512, in_arr.shape[0] - 1024)
            start_fill_idx = min(n * 512, in_arr.shape[0] - 512)
            rel_start = start_fill_idx - start_idx
            buf = jnp.asarray(in_arr[start_idx: start_idx + 1024][None])
            for nn in range(n_coarse, N_FINE_CODEBOOKS):
                key, kf = jax.random.split(key)
                buf = _fine_predict(self, buf, jnp.asarray(rel_start, jnp.int32),
                                    kf, pred_idx=nn, temperature=temperature)
            buf_np = np.asarray(buf)[0]
            in_arr[start_fill_idx: start_idx + 1024] = buf_np[rel_start:]
        gen = in_arr.T
        if n_remove > 0:
            gen = gen[:, :-n_remove]
        return gen

    def codec_decode(self, fine_tokens: np.ndarray) -> np.ndarray:
        """EnCodec decode of [8, T] fine tokens -> [1, samples]."""
        codec = self._get_codec()
        codes = jnp.asarray(fine_tokens, dtype=jnp.int32)[None, None]  # [1,1,8,T]
        audio = codec.decode(codes, [None])
        return np.asarray(audio)[:, :, 0]

    def generate(self, text: str, voice=None, temperature: float = 0.7,
                 seed: int = 0, **kwargs):
        start = time.perf_counter()
        semantic = self.generate_text_semantic(text, voice, temperature, seed)
        coarse = self.generate_coarse(semantic, voice, temperature, seed=seed)
        fine = self.generate_fine(coarse, temperature, seed=seed)
        audio = self.codec_decode(fine)[0]
        yield make_generation_result(
            audio, self.config.sample_rate, 0, int(len(semantic)),
            time.perf_counter() - start,
        )

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
