"""Voxtral — audio-conditioned LLM STT (Whisper-style audio tower ->
multimodal projector -> Llama LM with audio tokens spliced into the input
embeddings).

Capability parity with /root/reference/mlx_audio/stt/models/voxtral/
voxtral.py:24-462 + config.py:7-121, on this package's Llama and jitted
chunked decoding.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.models.base import BaseModelArgs
from mlx_audio_tpu.models.lm.llama import LlamaConfig, LlamaModel
from mlx_audio_tpu.models.sampling import (
    sample_top_k_rows,
    sample_top_p_rows,
)
from mlx_audio_tpu.nn import Conv1d, Embedding, LayerNorm, Linear, Module


@dataclass
class AudioConfig(BaseModelArgs):
    num_mel_bins: int = 128
    d_model: int = 1280
    encoder_layers: int = 32
    encoder_attention_heads: int = 20
    encoder_ffn_dim: int = 5120
    intermediate_size: int = 5120
    max_source_positions: int = 1500
    scale_embedding: bool = False


@dataclass
class TextConfig(BaseModelArgs):
    model_type: str = "llama"
    vocab_size: int = 131072
    max_position_embeddings: int = 131072
    hidden_size: int = 3072
    intermediate_size: int = 8192
    num_hidden_layers: int = 30
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    rms_norm_eps: float = 1e-5
    rope_theta: float = 1e8
    rope_scaling: Optional[Dict[str, Any]] = None
    attention_bias: bool = False
    mlp_bias: bool = False
    head_dim: Optional[int] = None
    tie_word_embeddings: bool = False

    def to_llama(self, max_ctx: int = 4096) -> LlamaConfig:
        return LlamaConfig(
            num_hidden_layers=self.num_hidden_layers,
            num_attention_heads=self.num_attention_heads,
            num_key_value_heads=self.num_key_value_heads,
            head_dim=self.head_dim or self.hidden_size // self.num_attention_heads,
            hidden_size=self.hidden_size,
            intermediate_size=self.intermediate_size,
            rms_norm_eps=self.rms_norm_eps,
            vocab_size=self.vocab_size,
            max_position_embeddings=min(self.max_position_embeddings, max_ctx),
            attention_bias=self.attention_bias,
            mlp_bias=self.mlp_bias,
            rope_theta=self.rope_theta,
            rope_scaling=self.rope_scaling,
            tie_word_embeddings=self.tie_word_embeddings,
        )


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "voxtral"
    audio_config: dict = field(default_factory=dict)
    text_config: dict = field(default_factory=dict)
    audio_token_id: int = 24
    tokenizer_name: Optional[str] = None


class VoxtralEncoderLayer(Module):
    def __init__(self, cfg: AudioConfig):
        d = cfg.d_model
        h = cfg.encoder_attention_heads
        self.n_head = h
        self.head_dim = d // h
        self.q_proj = Linear(d, d, bias=True)
        self.k_proj = Linear(d, d, bias=False)
        self.v_proj = Linear(d, d, bias=True)
        self.out_proj = Linear(d, d, bias=True)
        self.self_attn_layer_norm = LayerNorm(d)
        self.fc1 = Linear(d, cfg.encoder_ffn_dim)
        self.fc2 = Linear(cfg.encoder_ffn_dim, d)
        self.final_layer_norm = LayerNorm(d)

    def _attn(self, x):
        b, t, d = x.shape

        def split(z):
            return z.reshape(b, t, self.n_head, self.head_dim).transpose(0, 2, 1, 3)

        q = split(self.q_proj(x)) * self.head_dim ** -0.5
        k = split(self.k_proj(x))
        v = split(self.v_proj(x))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        return self.out_proj(out.transpose(0, 2, 1, 3).reshape(b, t, d))

    def __call__(self, x):
        x = x + self._attn(self.self_attn_layer_norm(x))
        x = x + self.fc2(jax.nn.gelu(self.fc1(self.final_layer_norm(x)),
                                     approximate=False))
        return x


class VoxtralEncoder(Module):
    def __init__(self, cfg: AudioConfig):
        self.cfg = cfg
        d = cfg.d_model
        self.conv1 = Conv1d(cfg.num_mel_bins, d, 3, padding=1)
        self.conv2 = Conv1d(d, d, 3, stride=2, padding=1)
        self.embed_positions = Embedding(cfg.max_source_positions, d)
        self.layers = [VoxtralEncoderLayer(cfg) for _ in range(cfg.encoder_layers)]
        self.layer_norm = LayerNorm(d)

    def __call__(self, mel: jax.Array) -> jax.Array:
        """mel [B, frames, num_mel_bins] -> [B, frames/2, d_model]."""
        x = jax.nn.gelu(self.conv1(mel), approximate=False)
        x = jax.nn.gelu(self.conv2(x), approximate=False)
        # index through __call__ (not raw .weight) so a quantized
        # embedding dequantizes its rows
        x = x + self.embed_positions(jnp.arange(x.shape[1]))
        for layer in self.layers:
            x = layer(x)
        return self.layer_norm(x)


class MultiModalProjector(Module):
    def __init__(self, audio_cfg: AudioConfig, text_cfg: TextConfig):
        self.linear_1 = Linear(audio_cfg.intermediate_size,
                               text_cfg.hidden_size, bias=False)
        self.linear_2 = Linear(text_cfg.hidden_size, text_cfg.hidden_size,
                               bias=False)

    def __call__(self, x):
        return self.linear_2(jax.nn.gelu(self.linear_1(x), approximate=False))


@partial(jax.jit, static_argnames=("chunk", "temperature", "top_k", "top_p"))
def _decode_chunk(model, caches, pad_len, last_token, key, chunk: int,
                  temperature: float, top_k: int, top_p: float):
    def body(carry, k):
        caches_s, prev = carry
        emb = model.language_model.embed_tokens(prev[:, None])
        h, caches_s = model.language_model.step(caches_s, emb, pad_len)
        logits = model.lm_logits(h[:, -1]).astype(jnp.float32)
        if temperature == 0:
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        elif top_p < 1.0:
            tok = sample_top_p_rows(k, logits, temperature, top_p)
        else:
            tok = sample_top_k_rows(k, logits, temperature, top_k)
        return (caches_s, tok), tok

    keys = jax.random.split(key, chunk)
    (caches, last), toks = jax.lax.scan(body, (caches, last_token), keys)
    return toks, caches, last


class Model(Module):
    def __init__(self, config, tokenizer=None):
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        self.config = config
        audio_cfg = AudioConfig.from_dict(config.audio_config or {})
        text_cfg = TextConfig.from_dict(config.text_config or {})
        self.audio_cfg = audio_cfg
        self.text_cfg = text_cfg
        self.audio_token_id = config.audio_token_id
        self.audio_tower = VoxtralEncoder(audio_cfg)
        self.multi_modal_projector = MultiModalProjector(audio_cfg, text_cfg)
        self.language_model = LlamaModel(text_cfg.to_llama())
        if not text_cfg.tie_word_embeddings:
            self.lm_head = Linear(text_cfg.hidden_size, text_cfg.vocab_size,
                                  bias=False)
        self._tokenizer = tokenizer

    def lm_logits(self, hidden):
        if self.text_cfg.tie_word_embeddings:
            return self.language_model.embed_tokens.as_linear(hidden)
        return self.lm_head(hidden)

    def get_audio_embeds(self, mel: jax.Array) -> jax.Array:
        """mel [B, frames, bins] -> audio token embeddings [N, hidden].

        Encoder frames are grouped by intermediate/d_model (4 for the
        published config) before projection (reference voxtral.py:217-222).
        """
        feats = self.audio_tower(mel)
        group = self.audio_cfg.intermediate_size // self.audio_cfg.d_model
        t = feats.shape[1] - feats.shape[1] % group
        feats = feats[:, :t].reshape(-1, self.audio_cfg.intermediate_size)
        return self.multi_modal_projector(feats)

    def merge_input_embeddings(self, input_ids: jax.Array,
                               mel: Optional[jax.Array]) -> jax.Array:
        if mel is not None:
            return _merge_embeds_jit(self, input_ids, mel)
        return self._merge_impl(input_ids, mel)

    def _merge_impl(self, input_ids: jax.Array,
                    mel: Optional[jax.Array]) -> jax.Array:
        embeds = self.language_model.embed_tokens(input_ids)
        if mel is None:
            return embeds
        audio_embeds = self.get_audio_embeds(mel)
        mask = input_ids == self.audio_token_id  # [B, T]
        b, t = input_ids.shape
        flat_mask = mask.reshape(-1)
        # positions of audio tokens receive consecutive audio embeddings
        idx = jnp.cumsum(flat_mask) - 1
        idx = jnp.clip(idx, 0, audio_embeds.shape[0] - 1)
        spliced = jnp.where(flat_mask[:, None], audio_embeds[idx],
                            embeds.reshape(b * t, -1))
        return spliced.reshape(embeds.shape)

    def generate(self, audio, *, mel=None, input_ids=None,
                 max_tokens: int = 128, temperature: float = 0.0,
                 top_p: float = 0.95, top_k: int = 0,
                 eos_token_ids=(2,), seed: int = 0, **kwargs):
        """Transcribe: mel + prompt ids -> STTOutput.

        Without an HF processor available, callers provide `mel`
        [frames, bins] and `input_ids` containing audio_token_id
        placeholders (one per audio embedding).
        """
        import time as _time

        from mlx_audio_tpu.models.stt.whisper.transcribe import STTOutput

        if isinstance(audio, str):
            from mlx_audio_tpu.utils.audio_io import load_audio

            audio = load_audio(audio, 16000)
        if mel is None and input_ids is None and audio is not None:
            # long audio: all encoder windows share one prompt layout, so
            # they decode as ONE batched AR loop (HF's processor likewise
            # chunks into 30 s windows but runs them serially)
            from mlx_audio_tpu.models.stt.whisper.audio import (
                log_mel_spectrogram,
            )

            full_mel = log_mel_spectrogram(
                np.asarray(audio), n_mels=self.audio_cfg.num_mel_bins
            )
            window = 2 * self.audio_cfg.max_source_positions
            if full_mel.shape[0] > window:
                mels = jnp.stack([
                    self._pad_window(full_mel[s: s + window])
                    for s in range(0, int(full_mel.shape[0]), window)
                ])
                rows = self._decode_window_rows(
                    mels, self._ids_for_window(), max_tokens=max_tokens,
                    temperature=temperature, top_p=top_p, top_k=top_k,
                    eos_token_ids=eos_token_ids, seed=seed,
                )
                texts = [self._tokenizer.decode(r)
                         if self._tokenizer is not None else ""
                         for r in rows]
                return STTOutput(text=" ".join(t for t in texts if t),
                                 segments=[{"tokens": r} for r in rows],
                                 language=kwargs.get("language", "en"))

        if mel is None or input_ids is None:
            mel, input_ids = self._prepare_inputs(audio, **kwargs)

        generated = self._decode_window_rows(
            jnp.asarray(mel, jnp.float32)[None], input_ids,
            max_tokens=max_tokens, temperature=temperature, top_p=top_p,
            top_k=top_k, eos_token_ids=eos_token_ids, seed=seed,
        )[0]
        text = (self._tokenizer.decode(generated)
                if self._tokenizer is not None else "")
        return STTOutput(text=text, segments=[{"tokens": generated}],
                         language=kwargs.get("language", "en"))

    def _decode_window_rows(self, mels, input_ids, *, max_tokens: int,
                            temperature: float, top_p: float, top_k: int,
                            eos_token_ids, seed: int):
        """Batched window decode: mels [W, frames, bins], one shared prompt
        [T] -> per-window generated token lists.  Per-row EOS tracked on
        host between scan chunks; under an active mesh with dp > 1 the
        window batch pads to a dp multiple and shards over 'data' (the
        same embarrassingly-parallel shape as Whisper windows)."""
        import contextlib

        from mlx_audio_tpu.parallel.context import active_mesh
        from mlx_audio_tpu.parallel.mesh import tp_rules_llama

        w = mels.shape[0]
        ctx = active_mesh()
        dp = ctx if (ctx is not None and ctx.dp > 1 and w > 1) else None
        if dp is not None and w % dp.dp:
            wn = -(-w // dp.dp) * dp.dp
            mels = jnp.concatenate(
                [mels, jnp.repeat(mels[-1:], wn - w, axis=0)], axis=0)
        wn = mels.shape[0]
        ids = np.asarray(input_ids).reshape(-1)
        t = len(ids)
        bucket = max(64, -(-t // 64) * 64)
        pad = bucket - t
        padded = np.zeros((wn, bucket), dtype=np.int32)
        padded[:, pad:] = ids

        # tp > 1 shards the Llama LM (and the audio tower's matching
        # projections) by tp_rules_llama — Voxtral-Mini-3B is the one model
        # in the suite that exceeds a 16 GB chip in f32 (docs/PERF.md), so
        # TP is its multi-chip existence case; dp composes for the window
        # batch exactly as in the CSM backbone (sesame _decode_placement).
        if ctx is not None and ctx.tp > 1:
            run = ctx.place_tp(self, tp_rules_llama)
            mesh_cm = ctx.mesh
        elif dp is not None:
            run = dp.place_replicated(self)
            mesh_cm = dp.mesh
        else:
            run, mesh_cm = self, contextlib.nullcontext()
        emb = run.language_model.embed_tokens
        # quantized embeddings hold uint8 codes; activations follow scales
        wdtype = (emb.scales.dtype if hasattr(emb, "scales")
                  else emb.weight.dtype)
        caches = run.language_model.init_cache(
            wn, max_len=bucket + max_tokens, dtype=wdtype)
        pad_len = jnp.full((wn,), pad, dtype=jnp.int32)
        padded_j = jnp.asarray(padded)
        mels_j = jnp.asarray(mels, jnp.float32)
        if dp is not None:
            caches = dp.shard_batch_tree(caches, wn)
            padded_j, pad_len, mels_j = dp.shard_batch(padded_j, pad_len,
                                                       mels_j)
        key = jax.random.PRNGKey(seed)
        with mesh_cm:
            embeds = run.merge_input_embeddings(padded_j, mels_j)
            h, caches = run.language_model.prefill(caches, embeds, pad_len)
            logits = run.lm_logits(h[:, -1]).astype(jnp.float32)
            key, k0 = jax.random.split(key)
            if temperature == 0:
                first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            else:
                first = sample_top_p_rows(k0, logits, temperature, top_p)
        first_np = np.asarray(first)

        out = [[] for _ in range(w)]
        done = np.zeros((w,), dtype=bool)
        for i in range(w):
            if int(first_np[i]) in eos_token_ids:
                done[i] = True
            else:
                out[i].append(int(first_np[i]))
        last = first
        produced = 1
        while produced < max_tokens and not done.all():
            n = min(32, max_tokens - produced)
            key, kc = jax.random.split(key)
            with mesh_cm:
                toks, caches, last = _decode_chunk(
                    run, caches, pad_len, last, kc, chunk=n,
                    temperature=temperature, top_k=top_k, top_p=top_p,
                )
            toks_np = np.asarray(toks)          # [n, Wn]
            for step in range(toks_np.shape[0]):
                for i in range(w):
                    if done[i]:
                        continue
                    tk = int(toks_np[step, i])
                    if tk in eos_token_ids:
                        done[i] = True
                    else:
                        out[i].append(tk)
            produced += toks_np.shape[0]
        return out

    def _pad_window(self, mel):
        window = 2 * self.audio_cfg.max_source_positions
        if mel.shape[0] < window:
            mel = jnp.pad(jnp.asarray(mel), ((0, window - mel.shape[0]), (0, 0)))
        return mel

    def _ids_for_window(self):
        group = self.audio_cfg.intermediate_size // self.audio_cfg.d_model
        n_audio_tokens = self.audio_cfg.max_source_positions // group
        return np.asarray([1] + [self.audio_token_id] * n_audio_tokens,
                          dtype=np.int32)

    def _prepare_inputs(self, audio, language="en", **kwargs):
        from mlx_audio_tpu.models.stt.whisper.audio import log_mel_spectrogram

        mel = log_mel_spectrogram(np.asarray(audio),
                                  n_mels=self.audio_cfg.num_mel_bins)
        # The encoder's positional table is sized for a fixed window of
        # 2 * max_source_positions frames (HF pads/rejects anything else,
        # modeling_voxtral.py VoxtralEncoder.forward); pad or trim to it.
        window = 2 * self.audio_cfg.max_source_positions
        if mel.shape[0] < window:
            mel = jnp.pad(mel, ((0, window - mel.shape[0]), (0, 0)))
        else:
            mel = mel[:window]
        n_audio_tokens = (mel.shape[0] // 2) // (
            self.audio_cfg.intermediate_size // self.audio_cfg.d_model
        )
        ids = [1] + [self.audio_token_id] * n_audio_tokens + [2]
        return mel, np.asarray(ids[:-1], dtype=np.int32)

    def sanitize(self, weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            v = np.asarray(v)
            if "conv" in k and k.endswith("weight") and v.ndim == 3:
                # torch [O, I, K] -> [K, I, O]
                v = v.transpose(2, 1, 0)
            k = k.replace("language_model.model.", "language_model.")
            k = k.replace("language_model.lm_head.", "lm_head.")
            if k.startswith("audio_tower."):
                # HF nests the encoder projections under .self_attn.; our
                # VoxtralEncoderLayer hosts them directly.
                k = k.replace(".self_attn.", ".")
            out[k] = v
        return out


@jax.jit
def _merge_embeds_jit(model, input_ids, mel):
    """Jitted audio-tower + projector + embed splice (model as pytree arg;
    docs/PERF.md)."""
    return model._merge_impl(input_ids, mel)
