"""IndexTTS: GPT-2 mel-code LM with conformer-perceiver voice conditioning
and a speaker-conditioned BigVGAN latent vocoder.

Capability parity with /root/reference/mlx_audio/tts/models/indextts/
indextts.py:29-413.

TPU design:
* The reference decodes one token per python iteration through mlx_lm's
  GPT2 (indextts.py:381-401); here prefill is one bucketed jitted call and
  decode runs in jitted lax.scan chunks that emit (latent, token) pairs —
  the latent stream is assembled on host and fed to BigVGAN in one call.
* Learned mel positions follow the reference quirk of offsetting by the
  full prompt length (indextts.py:396-397), clipped to the table size.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.models.base import make_generation_result
from mlx_audio_tpu.models.sampling import sample_top_k, sample_top_k_rows
from mlx_audio_tpu.nn import Embedding, LayerNorm, Linear, Module

from . import normalize
from .attention import LearnedPositionEncoding
from .conformer import Conformer, ConformerArgs
from .gpt import GPT2Args, GPT2Model
from .perceiver import PerceiverResampler
from .vocoder import (
    BigVGANConditioning,
    BigVGANConditioningConfig,
    log_mel_spectrogram,
)

# max rows per batched BigVGAN synthesis call (see generate_batch): the
# grouped-dispatch win saturates well below this, while activations for
# a 32-row group exceed the 16 GB chip next to the resident GPT
VOCODER_SUB_BATCH = 16


@dataclass
class GPTConfig:
    model_dim: int
    heads: int
    layers: int
    max_mel_tokens: int
    max_text_tokens: int
    number_text_tokens: int
    number_mel_codes: int
    start_mel_token: int
    stop_mel_token: int
    start_text_token: int
    stop_text_token: int
    use_mel_codes_as_input: bool = True
    mel_length_compression: int = 1024
    condition_type: str = "conformer_perceiver"
    condition_module: ConformerArgs = field(default_factory=ConformerArgs)
    max_conditioning_inputs: int = 1
    condition_num_latent: int = 32


@dataclass
class ModelConfig:
    bigvgan: BigVGANConditioningConfig
    gpt: GPTConfig
    tokenizer_name: Any = ""
    sample_rate: int = 24000

    @classmethod
    def from_dict(cls, params: Dict[str, Any]) -> "ModelConfig":
        p = dict(params)
        gpt = dict(p["gpt"])
        cond = gpt.get("condition_module", {})
        if isinstance(cond, dict):
            gpt["condition_module"] = ConformerArgs(**{
                k: v for k, v in cond.items()
                if k in ConformerArgs.__dataclass_fields__
            })
        gpt = {k: v for k, v in gpt.items()
               if k in GPTConfig.__dataclass_fields__}
        bigvgan = p["bigvgan"]
        if isinstance(bigvgan, dict):
            bigvgan = BigVGANConditioningConfig.from_dict(bigvgan)
        return cls(
            bigvgan=bigvgan, gpt=GPTConfig(**gpt),
            tokenizer_name=p.get("tokenizer_name", ""),
            sample_rate=p.get("sample_rate", 24000),
        )


def _bucket(n: int, step: int = 64) -> int:
    return max(step, -(-n // step) * step)


def _null_cm():
    import contextlib

    return contextlib.nullcontext()


@jax.jit
def _prefill_jit(model, caches, embeds, n_valid):
    hidden, caches = model.gpt.prefill(caches, embeds, n_valid)
    return model.final_norm(hidden), caches


@partial(jax.jit, static_argnames=("temp", "top_k", "chunk"))
def _decode_chunk(model, caches, last_token, prompt_len, pad_len, mel_pos0,
                  key, temp: float, top_k: int, chunk: int):
    """Scan `chunk` decode steps.  Each step embeds the previous mel code,
    runs one GPT step, emits (latent [B, D], next token [B]).

    prompt_len [B]: per-row learned-position offset (the reference quirk,
    indextts.py:396-397).  pad_len [B]: left-pad slots masked out of
    attention (ragged batches).  Sampling keys fold per row, so a row's
    draw is independent of the batch (dp padding keeps real rows exact)."""
    pos_table_len = model.mel_pos_embedding.emb.weight.shape[0]

    def body(carry, _):
        caches, tok, mel_pos, key = carry
        pos = jnp.minimum(prompt_len + mel_pos, pos_table_len - 1)  # [B]
        emb = (model.mel_embedding(tok[:, None])
               + model.mel_pos_embedding.emb(pos)[:, None])
        hidden, caches = model.gpt.step(caches, emb, pad_len)
        latent = model.final_norm(hidden)  # [B, D]
        logits = model.mel_head(latent)
        key, sub = jax.random.split(key)
        nxt = sample_top_k_rows(sub, logits, temp, top_k)  # [B]
        return (caches, nxt, mel_pos + 1, key), (latent, nxt)

    (caches, tok, mel_pos, key), (latents, tokens) = jax.lax.scan(
        body, (caches, last_token, mel_pos0, key), None, length=chunk
    )
    return caches, tok, mel_pos, key, latents, tokens


@jax.jit
def _prefill_left_jit(model, caches, embeds, pad_len):
    hidden, caches = model.gpt.prefill_left(caches, embeds, pad_len)
    return model.final_norm(hidden), caches


class Model(Module):
    def __init__(self, config, tokenizer=None):
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        if not config.gpt.use_mel_codes_as_input:
            raise NotImplementedError("use_mel_codes_as_input=false")
        if config.gpt.condition_type != "conformer_perceiver":
            raise NotImplementedError(
                f"condition_type={config.gpt.condition_type}")
        self.args = config
        self.sample_rate = config.sample_rate
        self._tokenizer = tokenizer

        g = config.gpt
        self.bigvgan = BigVGANConditioning(config.bigvgan)
        self.text_embedding = Embedding(g.number_text_tokens + 1, g.model_dim)
        self.mel_embedding = Embedding(g.number_mel_codes, g.model_dim)
        self.mel_pos_embedding = LearnedPositionEncoding(
            g.max_mel_tokens + 2 + g.max_conditioning_inputs, g.model_dim
        )
        self.text_pos_embedding = LearnedPositionEncoding(
            g.max_text_tokens + 2, g.model_dim
        )
        self.text_head = Linear(g.model_dim, g.number_text_tokens + 1)
        self.mel_head = Linear(g.model_dim, g.number_mel_codes)
        self.conditioning_encoder = Conformer(g.condition_module)
        self.perceiver_encoder = PerceiverResampler(
            g.model_dim,
            n_dim_context=g.condition_module.output_size,
            n_ff_mult=g.condition_module.perceiver_mult,
            n_heads=g.condition_module.attention_heads,
            n_latents=g.condition_num_latent,
        )
        self.gpt = GPT2Model(GPT2Args(g.model_dim, g.heads, g.layers))
        self.final_norm = LayerNorm(g.model_dim)

    @property
    def model_type(self) -> str:
        return "indextts"

    @property
    def tokenizer(self):
        if self._tokenizer is None:
            try:
                import sentencepiece as spm
            except ImportError as e:  # pragma: no cover - env without spm
                raise RuntimeError(
                    "IndexTTS needs sentencepiece (tokenizer.model); install "
                    "it or pass tokenizer= to Model()"
                ) from e
            self._tokenizer = spm.SentencePieceProcessor(
                model_file=str(
                    Path(self.args.tokenizer_name) / "tokenizer.model")
            )
        return self._tokenizer

    # -- conditioning (indextts.py:253-302) --------------------------------

    def get_conditioning(self, mel: jax.Array) -> jax.Array:
        """ref log-mel [B, T, 100] -> conditioning latents [B, 32, D]."""
        return _conditioning_jit(self, mel)

    def _get_conditioning_impl(self, mel: jax.Array) -> jax.Array:
        return self.perceiver_encoder(self.conditioning_encoder(mel))

    def prepare_input_embedding(self, prompts: List[str],
                                ref_mel: jax.Array) -> jax.Array:
        conditioning = self.get_conditioning(ref_mel)
        conditioning = jnp.repeat(conditioning, len(prompts), axis=0)
        g = self.args.gpt
        rows = []
        for idx, prompt in enumerate(prompts):
            tokens = list(self.tokenizer.encode(
                normalize.tokenize_by_CJK_char(normalize.normalize(prompt))
            ))
            tokens = [g.start_text_token] + tokens + [g.stop_text_token,
                                                     g.start_mel_token]
            tok = jnp.asarray(tokens, dtype=jnp.int32)[None]
            text_emb = self.text_embedding(tok) + self.text_pos_embedding(tok)
            rows.append(jnp.concatenate(
                [conditioning[idx:idx + 1], text_emb], axis=1))
        return rows[0] if len(rows) == 1 else rows

    # -- generation --------------------------------------------------------

    def generate(self, text: str, ref_audio=None, ref_mel=None,
                 verbose: bool = False, max_tokens: int = 5000,
                 temperature: float = 0.8, top_k: int = 30, seed: int = 0,
                 chunk: int = 64, **kwargs):
        yield self.generate_batch(
            [text], ref_audio=ref_audio, ref_mel=ref_mel,
            max_tokens=max_tokens, temperature=temperature, top_k=top_k,
            seed=seed, chunk=chunk,
        )[0]

    def generate_batch(self, texts: List[str], ref_audio=None, ref_mel=None,
                       max_tokens: int = 5000, temperature: float = 0.8,
                       top_k: int = 30, seed: int = 0, chunk: int = 64,
                       **kwargs) -> list:
        """Batched synthesis: B texts share one conditioning pass and one
        jitted mel-code decode loop (LEFT-padded ragged prompts, per-row
        stop tracking; every GPT weight fetch amortized over B rows).

        Under an active mesh with dp > 1 the batch pads to a dp multiple
        and shards over 'data' with the weights replicated; per-row
        sampling keys keep real rows exact vs the unsharded run.  BigVGAN
        synthesis runs per row (latent lengths are ragged).  New
        capability vs the reference (strictly single-text,
        indextts.py:352)."""
        from mlx_audio_tpu.parallel.context import active_mesh

        if ref_audio is not None:
            ref_mel = log_mel_spectrogram(
                jnp.asarray(ref_audio, dtype=jnp.float32))
        if ref_mel is None:
            raise ValueError("Must provide one of ref_audio or ref_mel")

        t0 = time.perf_counter()
        g = self.args.gpt
        b = len(texts)
        ctx = active_mesh()
        dp = ctx if (ctx is not None and ctx.dp > 1 and b > 1) else None
        run_texts = list(texts)
        if dp is not None:
            while len(run_texts) % dp.dp:
                run_texts.append(run_texts[-1])
        bn = len(run_texts)

        rows = self.prepare_input_embedding(run_texts, ref_mel)
        if bn == 1:
            rows = [rows]
        d = rows[0].shape[-1]
        lens = [int(r.shape[1]) for r in rows]
        bucket = _bucket(max(lens))
        padded = np.zeros((bn, bucket, d), dtype=np.float32)
        pad = np.zeros((bn,), dtype=np.int32)
        for i, r in enumerate(rows):
            pad[i] = bucket - lens[i]
            padded[i, pad[i]:] = np.asarray(r)[0]
        prompt_len = jnp.asarray(lens, dtype=jnp.int32)
        pad_len = jnp.asarray(pad)
        padded_j = jnp.asarray(padded)

        run_model = dp.place_replicated(self) if dp is not None else self
        mesh_cm = dp.mesh if dp is not None else _null_cm()
        wdtype = run_model.mel_embedding.weight.dtype
        caches = run_model.gpt.init_cache(bn, max_len=bucket + max_tokens,
                                          dtype=wdtype)
        if dp is not None:
            caches = dp.shard_batch_tree(caches, bn)
            padded_j, pad_len, prompt_len = dp.shard_batch(
                padded_j, pad_len, prompt_len)

        key = jax.random.PRNGKey(seed)
        with mesh_cm:
            latent0, caches = _prefill_left_jit(
                run_model, caches, padded_j, pad_len)
            key, sub = jax.random.split(key)
            first = sample_top_k_rows(
                sub, run_model.mel_head(latent0), temperature, top_k)

        latent0_np = np.asarray(latent0)
        first_np = np.asarray(first)
        latents = [[latent0_np[i]] for i in range(bn)]   # per-row [D] list
        n_tokens = np.zeros((bn,), dtype=np.int64)
        done = first_np == g.stop_mel_token
        last = first
        mel_pos = jnp.zeros((), dtype=jnp.int32)
        while not done[:b].all() and int(n_tokens[:b].max(initial=0)) < max_tokens:
            with mesh_cm:
                caches, last, mel_pos, key, lat_c, tok_c = _decode_chunk(
                    run_model, caches, last, prompt_len, pad_len, mel_pos,
                    key, temperature, top_k, chunk,
                )
            lat_np = np.asarray(lat_c)  # [chunk, Bn, D]
            tok_np = np.asarray(tok_c)  # [chunk, Bn]
            for i in range(bn):
                if done[i]:
                    continue
                hits = np.nonzero(tok_np[:, i] == g.stop_mel_token)[0]
                n_valid = int(hits[0]) + 1 if len(hits) else chunk
                # the latent of the stop step is included (reference keeps
                # it, indextts.py:381-401); its token is not
                latents[i].extend(lat_np[:n_valid, i])
                n_tokens[i] += n_valid
                if len(hits):
                    done[i] = True

        elapsed = time.perf_counter() - t0
        # BigVGAN synthesis: rows with equal latent counts batch into ONE
        # vocoder call (exact — identical ops, stacked); ragged rows fall
        # into per-length groups.  Full-budget/served batches of similar
        # texts collapse to a single dispatch (docs/PERF.md IndexTTS).
        lengths = [len(latents[i][: max_tokens + 1]) for i in range(b)]
        length_groups: Dict[int, list] = {}
        for i in range(b):
            length_groups.setdefault(lengths[i], []).append(i)
        # cap the vocoder sub-batch: BigVGAN's 1024x-upsampled conv
        # activations scale with rows and a 32-row group OOMs the 16 GB
        # chip next to the resident GPT (20.75G requested, r5 probe) —
        # 16 keeps the dispatch-batching win with bounded activations
        # (same shape as the Dia DAC cap, dia/audio.py)
        cap = VOCODER_SUB_BATCH
        groups = {
            (n, j): idxs[j * cap: (j + 1) * cap]
            for n, idxs in length_groups.items()
            for j in range(-(-len(idxs) // cap))
        }
        audios: Dict[int, np.ndarray] = {}
        for (n, _), idxs in groups.items():
            stack = jnp.asarray(
                np.stack([np.stack(latents[i][:n]) for i in idxs]),
                dtype=jnp.float32)                      # [G, n, D]
            mel_g = jnp.broadcast_to(
                ref_mel, (len(idxs),) + tuple(ref_mel.shape[1:]))
            wavs = np.asarray(self.bigvgan(stack, mel_g))
            for row, i in enumerate(idxs):
                audios[i] = wavs[row].reshape(-1)
        results = []
        for i in range(b):
            results.append(make_generation_result(
                audios[i], self.sample_rate, i, lengths[i], elapsed / b,
            ))
        return results

    # -- weights -----------------------------------------------------------

    def sanitize(self, weights: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """Torch IndexTTS checkpoint -> our layouts (reference
        indextts.py:138-251 does the analogous MLX mapping)."""
        gpt_w, bigvgan_w = {}, {}
        bigvgan_prefixes = ("ups.", "speaker_encoder.", "resblocks.",
                            "conv_pre.", "conv_post.", "conds.", "cond_layer.",
                            "activation_post.")
        for k, v in weights.items():
            (bigvgan_w if k.startswith(bigvgan_prefixes) else gpt_w)[k] = v

        out: Dict[str, np.ndarray] = {}
        for k, v in gpt_w.items():
            v = np.asarray(v)
            if "pos_enc" in k or "num_batches_tracked" in k:
                continue  # computed tables / torch counters
            if k.endswith(".attn.bias") and ".c_" not in k:
                continue  # HF causal-mask buffer
            # speechbrain wrapper flattening (as reference bigvgan.py:91-98)
            k = (k.replace("norm.norm", "norm").replace("conv.conv", "conv")
                 .replace("fc.conv", "fc").replace("asp_bn.norm", "asp_bn"))
            if "conv" in k and v.ndim == 3:
                v = v.transpose(2, 1, 0)  # torch [O, I, K] -> [K, I, O]
            elif "conv" in k and v.ndim == 4:
                v = v.transpose(2, 3, 1, 0)  # [O, I, kh, kw] -> HWIO
            if ("gpt.h." in k and v.ndim == 2 and k.endswith(".weight")
                    and (".c_attn." in k or ".c_proj." in k or ".c_fc." in k)):
                v = v.T  # HF GPT2 Conv1D stores [in, out]
            # perceiver naming: to_q / to_kv / to_out -> linear_{q,k,v,out}
            if "perceiver_encoder.layers." in k:
                if ".0.to_q." in k:
                    k = k.replace(".0.to_q.", ".0.linear_q.")
                elif ".0.to_out." in k:
                    k = k.replace(".0.to_out.", ".0.linear_out.")
                elif ".0.to_kv." in k:
                    kk, vv = np.split(v, 2, axis=0)
                    out[k.replace(".0.to_kv.", ".0.linear_k.")] = kk
                    out[k.replace(".0.to_kv.", ".0.linear_v.")] = vv
                    continue
                elif ".1.0." in k:
                    k = k.replace(".1.0.", ".1.w_1.")
                elif ".1.2." in k:
                    k = k.replace(".1.2.", ".1.w_2.")
            if k == "perceiver_encoder.norm.gamma":
                k = "perceiver_encoder.norm.weight"
            out[k] = v

        for k, v in bigvgan_w.items():
            v = np.asarray(v)
            if "num_batches_tracked" in k or ".filter" in k:
                continue  # torch counters / computed sinc filters
            k = (k.replace("norm.norm", "norm").replace("conv.conv", "conv")
                 .replace("conv1.conv", "conv1").replace("conv2.conv", "conv2")
                 .replace("fc.conv", "fc").replace("asp_bn.norm", "asp_bn"))
            if v.ndim == 3:
                if k.startswith("ups."):
                    v = v.transpose(2, 0, 1)  # convT [I, O, K] -> [K, I, O]
                else:
                    v = v.transpose(2, 1, 0)  # conv [O, I, K] -> [K, I, O]
            if (".alpha" in k or ".beta" in k) and v.ndim > 1:
                v = v.reshape(-1)
            out["bigvgan." + k] = v
        return out


@jax.jit
def _conditioning_jit(model, mel):
    """Jitted conditioning (model as pytree arg — eager calls re-trace with
    weights as constants; docs/PERF.md)."""
    return model._get_conditioning_impl(mel)
