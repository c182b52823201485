"""Sesame CSM-1B — conversational TTS / voice cloning, TPU-first.

Re-creates /root/reference/mlx_audio/tts/models/sesame/sesame.py:276-817:
a Llama-1B backbone predicts Mimi codebook-0 per 80 ms frame; a Llama-100M
depth decoder autoregresses codebooks 1..31 within the frame; Mimi decodes
to 24 kHz.

TPU execution plan (vs the reference's Python frame loop, sesame.py:774-817):

* Prompt prefill is one jitted graph per LEFT-padded length bucket.
* Frame generation runs in jitted chunks: a `lax.scan` over N frames whose
  body is backbone-step + a nested 30-step depth-decoder scan with
  on-device top-k sampling.  The host only inspects chunk outputs for the
  all-zero EOS frame (the reference's eos check, sesame.py:779) and
  handles streaming yields at chunk boundaries.
* Mimi decode of finished frames uses the batch or scan-streaming codec
  path.
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass
from functools import partial
from typing import Callable, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.codec.mimi import Mimi, mimi_202407
from mlx_audio_tpu.codec.mimi.mimi import mimi_from_hf_config
from mlx_audio_tpu.models.base import GenerationResult, make_generation_result
from mlx_audio_tpu.models.lm.llama import LLAMA_FLAVORS, LlamaConfig, LlamaModel
from mlx_audio_tpu.models.sampling import sample_top_k_rows
from mlx_audio_tpu.nn import Embedding, Linear, Module


@dataclass
class Segment:
    speaker: int
    text: str
    audio: np.ndarray  # (num_samples,) @ 24 kHz


def _llama_cfg_from_dict(d: dict, vocab_override: Optional[int] = None) -> LlamaConfig:
    return LlamaConfig(
        num_hidden_layers=d["num_hidden_layers"],
        num_attention_heads=d["num_attention_heads"],
        num_key_value_heads=d["num_key_value_heads"],
        head_dim=d["head_dim"],
        hidden_size=d["hidden_size"],
        intermediate_size=d["intermediate_size"],
        rms_norm_eps=d["rms_norm_eps"],
        vocab_size=vocab_override if vocab_override is not None else d["vocab_size"],
        max_position_embeddings=d.get("max_position_embeddings", 2048),
        attention_bias=d.get("attention_bias", False),
        mlp_bias=d.get("mlp_bias", False),
        rope_theta=d.get("rope_theta", 500000),
        rope_scaling=d.get("rope_scaling"),
    )


class SesameModel(Module):
    """Backbone + depth decoder + embeddings/heads (reference
    sesame.py:276-415)."""

    def __init__(self, config: dict):
        # accept both the reference config field names and HF transformers
        # CsmConfig names (num_codebooks / vocab_size, as sesame/csm-1b ships)
        self.audio_num_codebooks = config.get(
            "audio_num_codebooks", config.get("num_codebooks")
        )
        self.audio_vocab_size = config.get(
            "audio_vocab_size", config.get("vocab_size")
        )
        if "num_hidden_layers" in config:
            backbone_cfg = _llama_cfg_from_dict(
                config, vocab_override=int(config["text_vocab_size"])
            )
            decoder_cfg = _llama_cfg_from_dict(config["depth_decoder_config"])
        else:
            backbone_cfg = LLAMA_FLAVORS[config["backbone_flavor"]]
            decoder_cfg = LLAMA_FLAVORS[config["decoder_flavor"]]
        self.backbone_cfg = backbone_cfg
        self.decoder_cfg = decoder_cfg
        self.backbone = LlamaModel(backbone_cfg, use_embed_tokens=False)
        self.decoder = LlamaModel(decoder_cfg, use_embed_tokens=False)
        backbone_dim = backbone_cfg.hidden_size
        decoder_dim = decoder_cfg.hidden_size
        self.text_embeddings = Embedding(config["text_vocab_size"], backbone_dim)
        self.audio_embeddings = Embedding(
            self.audio_vocab_size * self.audio_num_codebooks, backbone_dim
        )
        self.projection = Linear(backbone_dim, decoder_dim, bias=False)
        self.codebook0_head = Linear(backbone_dim, self.audio_vocab_size, bias=False)
        self.audio_head = jnp.zeros(
            (self.audio_num_codebooks - 1, decoder_dim, self.audio_vocab_size)
        )

    # -- embeddings (reference sesame.py:397-415) --------------------------

    def embed_tokens(self, tokens: jax.Array, tokens_mask: jax.Array) -> jax.Array:
        """tokens [B, T, 33] (32 audio cb + text col) -> fused embeds [B, T, D]."""
        nc, v = self.audio_num_codebooks, self.audio_vocab_size
        text_emb = self.text_embeddings(tokens[:, :, -1])[:, :, None, :]
        offsets = (jnp.arange(nc) * v)[None, None, :]
        audio_emb = self.audio_embeddings(tokens[:, :, :-1] + offsets)
        embeds = jnp.concatenate([audio_emb, text_emb], axis=-2)  # [B,T,33,D]
        return jnp.sum(embeds * tokens_mask[..., None], axis=2)

    def embed_audio(self, codebook, tokens: jax.Array) -> jax.Array:
        return self.audio_embeddings(tokens + codebook * self.audio_vocab_size)

    # -- one frame (jit-safe; used inside the chunk scan) ------------------

    def generate_frame_step(self, caches: list, pad_len: jax.Array,
                            embeds: jax.Array, key: jax.Array,
                            temp: float, top_k: int):
        """embeds [B, S, D] (fused prompt or single-frame embeds) ->
        (frame codes [B, 33... actually [B, nc]], caches)."""
        h, caches = self.backbone.step(caches, embeds, pad_len)
        last_h = h[:, -1, :]
        k0, k_rest = jax.random.split(key)
        c0_logits = self.codebook0_head(last_h)
        c0 = sample_top_k_rows(k0, c0_logits, temp, top_k)[:, None]  # [B, 1]
        if (getattr(self, "spec_decode", False) and last_h.shape[0] == 1
                and getattr(self, "_spec_packed", None) is not None):
            frame = self._depth_decode_spec(last_h, c0, k_rest, temp, top_k)
        else:
            frame = self._depth_decode(last_h, c0, k_rest, temp, top_k)
        return frame, caches

    def lm_dtype(self):
        """Activation/cache dtype of the backbone LM (robust to quantized
        modules, whose `weight` is uint8)."""
        from mlx_audio_tpu.models.lm.causal import lm_dtype

        return lm_dtype(self.backbone)

    def _depth_decode(self, last_h: jax.Array, c0: jax.Array, key: jax.Array,
                      temp: float, top_k: int) -> jax.Array:
        """31 sequential depth-decoder steps as prefill + lax.scan
        (reference loop at sesame.py:379-393)."""
        b = last_h.shape[0]
        nc = self.audio_num_codebooks
        dec_caches = self.decoder.init_cache(b, max_len=nc + 1, dtype=last_h.dtype)
        pad0 = jnp.zeros((b,), dtype=jnp.int32)

        c0_embed = self.embed_audio(0, c0)  # [B, 1, D]
        first = jnp.concatenate([last_h[:, None, :], c0_embed], axis=1)
        h, dec_caches = self.decoder.step(dec_caches, self.projection(first), pad0)
        l1 = jnp.einsum("bd,dv->bv", h[:, -1, :], self.audio_head[0])
        key, k1 = jax.random.split(key)
        c1 = sample_top_k_rows(k1, l1, temp, top_k)[:, None]

        def body(carry, xs):
            caches, c_prev = carry
            i, head, k = xs
            embed = self.audio_embeddings(c_prev + i * self.audio_vocab_size)
            h, caches = self.decoder.step(caches, self.projection(embed), pad0)
            logits = jnp.einsum("bd,dv->bv", h[:, -1, :], head)
            c = sample_top_k_rows(k, logits, temp, top_k)[:, None]
            return (caches, c), c_prev

        n_rest = nc - 2
        xs = (
            jnp.arange(1, nc - 1),              # embed offsets for c_1..c_{nc-2}
            self.audio_head[1:],                 # heads producing c_2..c_{nc-1}
            jax.random.split(key, n_rest),
        )
        (dec_caches, c_last), cs = jax.lax.scan(body, (dec_caches, c1), xs)
        # cs collects the *inputs* (c_1..c_{nc-2}); append the final sample
        frame = jnp.concatenate(
            [c0, jnp.moveaxis(cs, 0, 1)[..., 0], c_last], axis=1
        )
        return frame  # [B, nc]

    # -- speculative depth decode (batch-1 latency; nn/pallas_depth) -------

    def enable_spec_decode(self, interpret: bool = False) -> None:
        """Pack the depth decoder for the int8 streaming draft kernel and
        switch `generate_frame_step` (batch 1) to draft+verify decoding.
        Exact: greedy draft is verified against bf16 logits, so the emitted
        frames match the plain decode path; sampling uses Gumbel-argmax
        (the same categorical distribution) with shared noise."""
        from mlx_audio_tpu.nn.pallas_depth import pack_depth

        self._spec_packed = pack_depth(
            self.decoder,
            np.asarray(self.projection.weight, np.float32).T,
            np.asarray(self.audio_head, np.float32),
            np.asarray(self.audio_embeddings.weight, np.float32),
            self.audio_vocab_size,
        )
        self.spec_decode = True
        self._spec_interpret = interpret

    def _depth_decode_spec(self, last_h: jax.Array, c0: jax.Array,
                           key: jax.Array, temp: float,
                           top_k: int) -> jax.Array:
        """Draft c2..c31 with the int8 streaming kernel, verify against ONE
        teacher-forced bf16 pass, finish any rejected tail with bf16 steps
        (lax.while_loop) — output distribution identical to sequential bf16
        decoding (bit-equal under greedy)."""
        from mlx_audio_tpu.nn.pallas_depth import (
            _topk_bisect_mask,
            depth_draft_pallas,
        )

        nc = self.audio_num_codebooks
        v = self.audio_vocab_size
        packed = self._spec_packed
        vpad = packed.heads.shape[2]
        cap = 40                      # kernel cache rows (nc + 1 padded)
        pad0 = jnp.zeros((1,), dtype=jnp.int32)
        wdtype = last_h.dtype

        def gumbel_argmax(logits, noise_row):
            """Top-k categorical via Gumbel-argmax; the kernel makes the
            same decision from its int8 logits (same noise, same bisection
            mask), so draft == target whenever the quantized ranking
            agrees."""
            lane = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            valid = lane < v
            z = jnp.where(valid, logits.astype(jnp.float32), -jnp.inf)
            if temp > 0:
                z = z / temp
                if 0 < top_k < v:
                    z = _topk_bisect_mask(z, valid, top_k)
                z = z + noise_row
            return jnp.argmax(z, axis=-1).astype(jnp.int32)

        if temp > 0:
            noise = jax.random.gumbel(key, (nc - 1, vpad), dtype=jnp.float32)
        else:
            noise = jnp.zeros((nc - 1, vpad), dtype=jnp.float32)

        # ---- bf16 prefill of [last_h, c0_embed] -> c1 -------------------
        dec_caches = self.decoder.init_cache(1, max_len=cap, dtype=wdtype)
        c0_embed = self.embed_audio(0, c0)
        first = jnp.concatenate([last_h[:, None, :], c0_embed], axis=1)
        h, dec_caches = self.decoder.step(dec_caches, self.projection(first),
                                          pad0)
        l1 = jnp.einsum("bd,dv->bv", h[:, -1, :], self.audio_head[0])
        l1p = jnp.pad(l1, ((0, 0), (0, vpad - v)),
                      constant_values=-jnp.inf)
        c1 = gumbel_argmax(l1p, noise[0:1])[0]            # [] int32

        # ---- int8 draft of c2..c31 --------------------------------------
        kc = jnp.stack([c.k[0].astype(jnp.float32) for c in dec_caches])
        vc = jnp.stack([c.v[0].astype(jnp.float32) for c in dec_caches])
        draft = depth_draft_pallas(
            packed, kc, vc, c1, noise[1:], self.audio_vocab_size,
            temp, top_k, interpret=getattr(self, "_spec_interpret", False),
        )                                                  # [nc-2]
        draft_full = jnp.concatenate([c1[None], draft])    # c1..c31 [nc-1]

        # ---- ONE teacher-forced bf16 pass over all 32 positions ---------
        offs = jnp.arange(1, nc - 1) * v                   # embeds c1..c30
        emb = self.audio_embeddings(draft_full[:-1] + offs)[None]
        ver_in = self.projection(
            jnp.concatenate([first, emb.astype(wdtype)], axis=1)
        )                                                  # [1, nc, D]
        ver_caches = self.decoder.init_cache(1, max_len=cap, dtype=wdtype)
        vh, ver_caches = self.decoder.prefill(ver_caches, ver_in, pad0)
        logits = jnp.einsum("btd,tdv->btv", vh[:, 1:, :], self.audio_head)
        logits = jnp.pad(logits, ((0, 0), (0, 0), (0, vpad - v)),
                         constant_values=-jnp.inf)[0]      # [nc-1, vpad]
        targets = jax.vmap(
            lambda lg, nz: gumbel_argmax(lg[None], nz[None])[0]
        )(logits, noise)                                   # [nc-1]

        match = targets == draft_full
        m = jnp.argmin(match)                              # first mismatch
        m = jnp.where(match.all(), nc - 1, m)
        corrected = jnp.where(jnp.arange(nc - 1) < m, draft_full, targets)
        # tokens c1..c_{m+1} now correct; finish c_{m+2}.. sequentially on
        # the verify cache (its slots 0..m+1 were built from correct inputs)
        tokens0 = corrected

        def cond(st):
            return st[2] < nc - 1

        def body(st):
            caches, toks, j = st
            tok = jnp.take(toks, j - 1)
            embed = self.audio_embeddings(tok[None, None] + j * v)
            hh, caches = self.decoder.step(
                caches, self.projection(embed.astype(wdtype)), pad0)
            lg = jnp.einsum("bd,dv->bv",
                            hh[:, -1, :], jnp.take(self.audio_head, j,
                                                   axis=0))
            lgp = jnp.pad(lg, ((0, 0), (0, vpad - v)),
                          constant_values=-jnp.inf)
            nz = jax.lax.dynamic_slice(noise, (j, 0), (1, vpad))
            t = gumbel_argmax(lgp, nz)[0]
            return caches, toks.at[j].set(t), j + 1

        fixed = [c._replace(idx=m + 2) for c in ver_caches]
        _, tokens, _ = jax.lax.while_loop(
            cond, body, (fixed, tokens0, m + 1))
        return jnp.concatenate([c0, tokens[None]], axis=1)  # [1, nc]


class Model(Module):
    """User-facing CSM model (reference sesame.py:441-817)."""

    def __init__(self, config: dict, mimi: Optional[Mimi] = None,
                 text_tokenizer=None):
        self.config = config
        self.model = SesameModel(config)
        self.audio_num_codebooks = self.model.audio_num_codebooks
        if mimi is not None:
            self._mimi = mimi
        elif isinstance(config.get("codec_config"), dict):
            # HF CsmConfig embeds the Mimi architecture; its weights arrive
            # as codec_model.* through sanitize_hf_csm
            self._mimi = Mimi(mimi_from_hf_config(config["codec_config"]))
        else:
            self._mimi = Mimi(mimi_202407(self.model.audio_num_codebooks))
        self._text_tokenizer = text_tokenizer
        self._sample_rate = int(self._mimi.sample_rate)
        # Imperceptible AI-audio watermark on every output (reference
        # sesame.py:631-642); disable only with apply_watermark=False.
        self.apply_watermark = config.get("apply_watermark", True)

    def _watermark(self, audio: np.ndarray) -> np.ndarray:
        if not self.apply_watermark:
            return audio
        # built per call: the PN table is tiny, and caching it on the module
        # would mutate static pytree metadata (jit cache invalidation)
        from .watermarking import CSM_1B_GH_WATERMARK, load_watermarker, watermark

        return watermark(load_watermarker(), audio, self._sample_rate,
                         CSM_1B_GH_WATERMARK)

    def cast_lm(self, dtype) -> "Model":
        """Cast the backbone/depth-decoder LM to ``dtype`` (bf16 halves the
        HBM traffic of the memory-bound AR decode loop), keeping Mimi and
        the watermarking path in f32.  RoPE tables stay f32 — apply_rope
        casts per use, and bf16 cos/sin would cost rotary precision for
        free.  Returns self."""
        from mlx_audio_tpu.nn.module import map_arrays

        def cast(path, x):
            if "rope_cos" in path or "rope_sin" in path:
                return x
            if jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(dtype)
            return x

        self.model = map_arrays(self.model, cast)
        return self

    @property
    def sample_rate(self) -> int:
        return self._sample_rate

    @property
    def mimi(self) -> Mimi:
        return self._mimi

    def _decode_placement(self, batch: int = 1):
        """(lm, mesh_cm, dp_ctx): the LM to decode with, a context manager
        to run decode steps under, and the mesh context when its data axis
        can shard a ``batch``-row decode (else None).  With tp > 1 the
        backbone/depth-decoder weights are sharded by tp_rules_llama
        (cached); with dp > 1 and a multi-row batch the weights replicate
        over 'data' while the caller shards the batch axis — dp=4,tp=2
        composes (weights split over 'model' only, batch over 'data').
        Mimi and the watermark stay replicated host-side."""
        import contextlib

        from mlx_audio_tpu.parallel.context import active_mesh
        from mlx_audio_tpu.parallel.mesh import tp_rules_llama

        ctx = active_mesh()
        dp = ctx if (ctx is not None and ctx.dp > 1 and batch > 1) else None
        if ctx is not None and ctx.tp > 1:
            return ctx.place_tp(self.model, tp_rules_llama), ctx.mesh, dp
        if dp is not None:
            return dp.place_replicated(self.model), dp.mesh, dp
        return self.model, contextlib.nullcontext(), None

    def _get_tokenizer(self):
        if self._text_tokenizer is None:
            from mlx_audio_tpu.models.tts.sesame.tokenizer import load_llama3_tokenizer

            self._text_tokenizer = load_llama3_tokenizer(
                self.config.get("text_tokenizer", "unsloth/Llama-3.2-1B")
            )
        return self._text_tokenizer

    # -- tokenization (reference sesame.py:484-541) ------------------------

    def _tokenize_text_segment(self, text: str, speaker: int):
        nc1 = self.audio_num_codebooks + 1
        ids = np.asarray(self._get_tokenizer().encode(f"[{speaker}]{text}"))
        frame = np.zeros((len(ids), nc1), dtype=np.int32)
        mask = np.zeros((len(ids), nc1), dtype=bool)
        frame[:, -1] = ids
        mask[:, -1] = True
        return frame, mask

    def _tokenize_audio(self, audio: np.ndarray, add_eos: bool = True):
        nc1 = self.audio_num_codebooks + 1
        pcm = jnp.asarray(audio, dtype=jnp.float32)[None, None, :]
        # pad to whole codec frames
        spf = self._mimi.samples_per_frame
        t = pcm.shape[-1]
        pad = (-t) % spf
        if pad:
            pcm = jnp.pad(pcm, ((0, 0), (0, 0), (0, pad)))
        codes = np.asarray(self._mimi.encode(pcm))[0]  # [nc, T]
        if add_eos:
            codes = np.concatenate(
                [codes, np.zeros((codes.shape[0], 1), dtype=codes.dtype)], axis=1
            )
        frame = np.zeros((codes.shape[1], nc1), dtype=np.int32)
        mask = np.zeros((codes.shape[1], nc1), dtype=bool)
        frame[:, :-1] = codes.T
        mask[:, :-1] = True
        return frame, mask

    def _tokenize_segment(self, segment: Segment, add_eos: bool = True):
        tf, tm = self._tokenize_text_segment(segment.text, segment.speaker)
        af, am = self._tokenize_audio(segment.audio, add_eos=add_eos)
        return np.concatenate([tf, af]), np.concatenate([tm, am])

    # -- generation --------------------------------------------------------

    def generate(
        self,
        text,
        voice: Optional[str] = None,
        speaker: int = 0,
        context: Optional[List[Segment]] = None,
        split_pattern: Optional[str] = r"\n+",
        max_audio_length_ms: float = 90_000,
        ref_audio: Optional[np.ndarray] = None,
        ref_text: Optional[str] = None,
        stream: bool = False,
        streaming_interval: float = 0.5,
        voice_match: bool = True,
        temperature: float = 0.9,
        top_k: int = 50,
        seed: int = 0,
        **kwargs,
    ):
        context = list(context or [])
        if not context and ref_audio is not None and ref_text is not None:
            context = [Segment(speaker=speaker, text=ref_text, audio=ref_audio)]
        if not context:
            raise ValueError(
                "CSM requires a reference: pass ref_audio+ref_text or context "
                "segments (default HF speaker prompts need network access)"
            )

        max_audio_frames = int(max_audio_length_ms / 80)
        chunk = max(1, int(streaming_interval * 12.5)) if stream else 32

        if isinstance(text, str):
            text = re.split(split_pattern, text.strip()) if split_pattern else [text]

        # multi-segment non-streaming text under a dp>1 mesh: one batched
        # DP pass over the segments instead of the sequential loop
        from mlx_audio_tpu.parallel.context import active_mesh

        mesh_ctx = active_mesh()
        if (not stream and mesh_ctx is not None and mesh_ctx.dp > 1
                and len(text) > 1):
            for r in self.generate_batch(
                list(text), speaker=speaker, context=context,
                max_audio_length_ms=max_audio_length_ms,
                voice_match=voice_match, temperature=temperature,
                top_k=top_k, seed=seed,
            ):
                yield r
            return

        key = jax.random.PRNGKey(seed)
        for seg_idx, prompt in enumerate(text):
            start_time = time.perf_counter()
            if voice_match:
                gen_text = (context[0].text + " " + prompt).strip()
                cur_context = [Segment(speaker=speaker, text=gen_text,
                                       audio=context[0].audio)]
            else:
                cur_context = context

            toks, masks = [], []
            for s in cur_context:
                tf, tm = self._tokenize_segment(s, add_eos=not voice_match)
                toks.append(tf)
                masks.append(tm)
            if not voice_match:
                tf, tm = self._tokenize_text_segment(prompt, speaker)
                toks.append(tf)
                masks.append(tm)
            prompt_tokens = np.concatenate(toks).astype(np.int32)
            prompt_mask = np.concatenate(masks)

            max_seq_len = self.model.backbone_cfg.max_position_embeddings - max_audio_frames
            if prompt_tokens.shape[0] >= max_seq_len:
                raise ValueError(
                    f"Inputs too long, must be below {max_seq_len}"
                )

            key, gen_key = jax.random.split(key)

            if stream:
                # FUSED first audio: prefill + the first 3 frames + the
                # stateful Mimi decode run as ONE dispatch — on the
                # tunneled runtime each separate jit call paid a ~35-45 ms
                # round trip, and the first-chunk path had four of them
                # (docs/PERF.md TTFA decomposition).  Per-frame fold_in
                # keys keep the emitted frames identical to any chunk
                # schedule.
                n_first = min(3, max_audio_frames)
                (lm, mesh_cm, tokens_j, mask_j, pad_len,
                 caches) = self._prep_prompt(prompt_tokens, prompt_mask,
                                             max_audio_frames)
                mimi_state = self._mimi.init_state(1)
                with mesh_cm:
                    audio0, frames3, caches, mimi_state = _first_audio_fused(
                        lm, self._mimi, caches, pad_len, tokens_j, mask_j,
                        gen_key, mimi_state, temperature, top_k,
                        n_first=n_first,
                    )
                frames_np = np.asarray(frames3)[:, 0]        # [n_first, nc]
                eos_rows = np.nonzero((frames_np == 0).all(axis=1))[0]
                n_valid = int(eos_rows[0]) if len(eos_rows) else n_first
                spf = int(round(self._sample_rate / 12.5))   # samples/frame
                if n_valid:
                    audio_np = self._watermark(
                        np.asarray(audio0)[0, 0][: n_valid * spf])
                    yield make_generation_result(
                        audio_np, self._sample_rate, seg_idx, n_valid,
                        time.perf_counter() - start_time,
                    )
                    start_time = time.perf_counter()
                if len(eos_rows) or n_valid >= max_audio_frames:
                    continue
                for part in self._frame_loop(
                    lm, mesh_cm, caches, pad_len, gen_key,
                    frames_np[-1], n_first, max_audio_frames, chunk,
                    temperature, top_k, ramp_sizes=[4],
                ):
                    codes = jnp.asarray(np.stack(part, axis=-1))[None]  # [1,nc,T]
                    audio, mimi_state = self._mimi.decode_frames_stateful(
                        codes, mimi_state
                    )
                    audio_np = self._watermark(np.asarray(audio)[0, 0])
                    yield make_generation_result(
                        audio_np, self._sample_rate, seg_idx, len(part),
                        time.perf_counter() - start_time,
                    )
                    start_time = time.perf_counter()
            else:
                frames_np = []
                for part in self._generate_frame_chunks(
                    prompt_tokens, prompt_mask, max_audio_frames, chunk,
                    temperature, top_k, gen_key,
                ):
                    frames_np.extend(part)
                if len(frames_np) == 0:
                    continue
                codes = jnp.asarray(np.stack(frames_np, axis=-1))[None]
                audio = self._watermark(np.asarray(self._mimi.decode(codes))[0, 0])
                yield make_generation_result(
                    audio, self._sample_rate, seg_idx, len(frames_np),
                    time.perf_counter() - start_time,
                )

    def generate_batch(
        self,
        texts: List[str],
        speaker: int = 0,
        context: Optional[List[Segment]] = None,
        max_audio_length_ms: float = 90_000,
        ref_audio: Optional[np.ndarray] = None,
        ref_text: Optional[str] = None,
        voice_match: bool = True,
        temperature: float = 0.9,
        top_k: int = 50,
        seed: int = 0,
        chunk: int = 32,
    ) -> List[GenerationResult]:
        """Batched synthesis: decode all ``texts`` in one jitted AR loop.

        The decode loop is HBM-bound on weight reads, so batching is the
        single-chip throughput lever: B utterances share every backbone /
        depth-decoder weight fetch.  Per-sequence EOS is tracked on host
        between chunks; finished sequences keep stepping (their frames are
        discarded) until all are done.  New capability vs the reference
        (whose loop is strictly batch-1, sesame.py:774-817).
        """
        context = list(context or [])
        if not context and ref_audio is not None and ref_text is not None:
            context = [Segment(speaker=speaker, text=ref_text, audio=ref_audio)]
        if not context:
            raise ValueError(
                "CSM requires a reference: pass ref_audio+ref_text or context"
            )
        max_frames = int(max_audio_length_ms / 80)
        start_time = time.perf_counter()

        # per-sequence prompts (voice-match: ref text+audio prepended)
        prompts = []
        for prompt in texts:
            if voice_match:
                gen_text = (context[0].text + " " + prompt).strip()
                segs = [Segment(speaker=speaker, text=gen_text,
                                audio=context[0].audio)]
                toks = [self._tokenize_segment(s, add_eos=False) for s in segs]
            else:
                toks = [self._tokenize_segment(s) for s in context]
                toks.append(self._tokenize_text_segment(prompt, speaker))
            prompts.append(
                (np.concatenate([t for t, _ in toks]).astype(np.int32),
                 np.concatenate([m for _, m in toks]))
            )

        b = len(prompts)
        nc1 = self.audio_num_codebooks + 1
        max_seq_len = (self.model.backbone_cfg.max_position_embeddings
                       - max_frames)
        longest = max(p.shape[0] for p, _ in prompts)
        if longest >= max_seq_len:
            raise ValueError(f"Inputs too long, must be below {max_seq_len}")
        bucket = _prompt_bucket(longest)
        tokens = np.zeros((b, bucket, nc1), dtype=np.int32)
        mask = np.zeros((b, bucket, nc1), dtype=bool)
        pad = np.zeros((b,), dtype=np.int32)
        for i, (p, m) in enumerate(prompts):
            pad[i] = bucket - p.shape[0]
            tokens[i, pad[i]:] = p
            mask[i, pad[i]:] = m

        lm, mesh_cm, dp = self._decode_placement(batch=b)
        if dp is not None:
            from mlx_audio_tpu.parallel.context import pad_batch_arrays

            tokens, mask, pad, _ = pad_batch_arrays(dp, tokens, mask, pad)
        bn = tokens.shape[0]                  # dp-padded batch
        wdtype = self.model.lm_dtype()
        caches = lm.backbone.init_cache(
            bn, max_len=bucket + max_frames, dtype=wdtype
        )
        pad_len = jnp.asarray(pad)
        tokens_j, mask_j = jnp.asarray(tokens), jnp.asarray(mask)
        if dp is not None:
            caches = dp.shard_batch_tree(caches, bn)
            tokens_j, mask_j, pad_len = dp.shard_batch(tokens_j, mask_j,
                                                       pad_len)
        key = jax.random.PRNGKey(seed)
        with mesh_cm:
            frame, caches = _prefill_and_first_frame(
                lm, caches, pad_len, tokens_j, mask_j,
                key, temperature, top_k,
            )
        first = np.asarray(frame)             # [Bn, nc]
        all_frames = [first]
        done = (first[:b] == 0).all(axis=1)
        n_frames = np.where(done, 0, 1)       # per-sequence audio length
        last = frame
        produced = 1
        while produced < max_frames and not done.all():
            n = min(chunk, max_frames - produced)
            with mesh_cm:
                out, caches = _frame_chunk(
                    lm, caches, pad_len, last,
                    key, temperature, top_k, jnp.zeros((n,), dtype=jnp.int32),
                    frame0=produced,
                )
            out_np = np.asarray(out)          # [n, Bn, nc]
            for f in out_np:
                eos = (f[:b] == 0).all(axis=1)
                done = done | eos
                n_frames = np.where(done, n_frames, n_frames + 1)
                all_frames.append(f)
                produced += 1
            last = out[-1]

        codes = np.stack(all_frames, axis=-1)                     # [Bn, nc, T]
        if dp is not None:
            # the vocoder pass shards the same way: Bn rows over 'data',
            # Mimi weights replicated
            mimi = dp.place_replicated(self._mimi)
            with dp.mesh:
                audio = np.asarray(
                    mimi.decode(dp.shard_batch(jnp.asarray(codes)))
                )[:b, 0]
        else:
            audio = np.asarray(self._mimi.decode(jnp.asarray(codes)))[:, 0]
        spf = int(self._mimi.samples_per_frame)
        elapsed = time.perf_counter() - start_time
        results = []
        for i in range(b):
            a = audio[i, : int(n_frames[i]) * spf]
            a = self._watermark(a) if a.size else a
            results.append(make_generation_result(
                a, self._sample_rate, i, int(n_frames[i]),
                elapsed / b,
            ))
        return results

    def _prep_prompt(self, prompt_tokens, prompt_mask, max_frames):
        """Bucket/pad the prompt and build the KV caches (dtype follows
        the LM weights: a bf16-cast model halves every per-step HBM read)."""
        t = prompt_tokens.shape[0]
        bucket = _prompt_bucket(t)
        pad = bucket - t
        tokens = np.zeros((1, bucket, prompt_tokens.shape[1]), dtype=np.int32)
        mask = np.zeros((1, bucket, prompt_tokens.shape[1]), dtype=bool)
        tokens[0, pad:] = prompt_tokens
        mask[0, pad:] = prompt_mask
        pad_len = jnp.asarray([pad], dtype=jnp.int32)
        lm, mesh_cm, _ = self._decode_placement()
        wdtype = self.model.lm_dtype()
        caches = lm.backbone.init_cache(1, max_len=bucket + max_frames,
                                        dtype=wdtype)
        return (lm, mesh_cm, jnp.asarray(tokens), jnp.asarray(mask),
                pad_len, caches)

    def _frame_loop(self, lm, mesh_cm, caches, pad_len, key, last_frame,
                    produced, max_frames, chunk, temp, top_k, ramp_sizes):
        """Chunked scans from an existing decode state until EOS/max;
        yields lists of [nc] frame-code arrays."""
        pending = []
        done = False
        while produced < max_frames and not done:
            n = min(ramp_sizes.pop(0) if ramp_sizes else chunk,
                    max_frames - produced)
            with mesh_cm:
                out_frames, caches = _frame_chunk(
                    lm, caches, pad_len, jnp.asarray(last_frame)[None],
                    key, temp, top_k, jnp.zeros((n,), dtype=jnp.int32),
                    frame0=produced,
                )
            out_np = np.asarray(out_frames)[:, 0]  # [n, nc]
            for f in out_np:
                if (f == 0).all():
                    done = True
                    break
                pending.append(f)
                last_frame = f
                produced += 1
                if produced >= max_frames:
                    break
            if pending:
                yield pending
                pending = []
        if pending:
            yield pending

    def _generate_frame_chunks(self, prompt_tokens, prompt_mask, max_frames,
                               chunk, temp, top_k, key, ramp=False):
        """Host driver: prefill then chunked scans until EOS/max; yields
        lists of [nc] frame-code arrays as they are produced.

        ramp=True (streaming): the first chunks are 2 then 4 frames before
        settling on `chunk`, so the first audio bytes leave ~4 frames
        (~320 ms of audio, tens of ms of compute) earlier.  Per-frame
        fold_in keys make the emitted frames identical for ANY chunk
        schedule, so the ramp changes latency, not content."""
        (lm, mesh_cm, tokens_j, mask_j, pad_len,
         caches) = self._prep_prompt(prompt_tokens, prompt_mask, max_frames)
        with mesh_cm:
            frame, caches = _prefill_and_first_frame(
                lm, caches, pad_len, tokens_j, mask_j, key, temp, top_k,
            )
        frame_np = np.asarray(frame)[0]
        if (frame_np == 0).all():
            return
        yield [frame_np]
        ramp_sizes = [s for s in (2, 4) if ramp and s < chunk]
        yield from self._frame_loop(
            lm, mesh_cm, caches, pad_len, key, frame_np, 1, max_frames,
            chunk, temp, top_k, ramp_sizes,
        )

    # -- weights -----------------------------------------------------------

    def sanitize(self, weights: dict) -> dict:
        return sanitize(weights)


def _prompt_bucket(n: int) -> int:
    """Prompt-length buckets: powers of two to 256, then steps of 128."""
    for b in (64, 128, 256):
        if n <= b:
            return b
    return -(-n // 128) * 128


@partial(jax.jit, static_argnames=("temp", "top_k"), donate_argnums=(1,))
def _prefill_and_first_frame(model, caches, pad_len, tokens, mask, key,
                             temp, top_k):
    embeds = model.embed_tokens(tokens, mask)
    h, caches = model.backbone.prefill(caches, embeds, pad_len)
    last_h = h[:, -1, :]
    # frame keys fold on the ABSOLUTE frame index (frame 0 here), so the
    # sampled frames are independent of how the host chunks the loop —
    # streaming chunk schedules (including the latency ramp) are exactly
    # the batch run
    k0, k_rest = jax.random.split(jax.random.fold_in(key, 0))
    c0 = sample_top_k_rows(k0, model.codebook0_head(last_h), temp, top_k)[:, None]
    if (getattr(model, "spec_decode", False) and last_h.shape[0] == 1
            and getattr(model, "_spec_packed", None) is not None):
        frame = model._depth_decode_spec(last_h, c0, k_rest, temp, top_k)
    else:
        frame = model._depth_decode(last_h, c0, k_rest, temp, top_k)
    return frame, caches


@partial(jax.jit, static_argnames=("temp", "top_k", "n_first"),
         donate_argnums=(2,))
def _first_audio_fused(model, mimi, caches, pad_len, tokens, mask, key,
                       mimi_state, temp, top_k, n_first: int):
    """Prefill + the first `n_first` frames + stateful Mimi decode as ONE
    program: the streaming first-chunk path previously dispatched four
    jits with a host hop between each — on the tunneled runtime that is
    ~4 x 35-45 ms of pure round-trip latency (docs/PERF.md TTFA
    decomposition).  Frames use the same absolute-index fold_in keys as
    the unfused path, so emitted content is identical; Mimi's causal
    streaming decode means the first j frames' samples are unaffected by
    any post-EOS frames the host later truncates.

    Returns (audio [1, 1, samples], frames [n_first, 1, nc], caches,
    mimi_state)."""
    frame, caches = _prefill_and_first_frame(
        model, caches, pad_len, tokens, mask, key, temp, top_k)
    if n_first > 1:
        out, caches = _frame_chunk(
            model, caches, pad_len, frame, key, temp, top_k,
            jnp.zeros((n_first - 1,), dtype=jnp.int32), frame0=1)
        codes = jnp.concatenate(
            [frame[:, :, None], jnp.moveaxis(out, 0, 2)], axis=2)
        frames_all = jnp.concatenate([frame[None], out], axis=0)
    else:
        codes = frame[:, :, None]
        frames_all = frame[None]
    audio, mimi_state = mimi._decode_frames_stateful_impl(codes, mimi_state)
    return audio, frames_all, caches, mimi_state


@partial(jax.jit, static_argnames=("temp", "top_k"), donate_argnums=(1,))
def _frame_chunk(model, caches, pad_len, last_frame, key, temp, top_k, n_arr,
                 frame0=0):
    """Generate n frames via lax.scan.  last_frame: [B, nc] codes of the
    previously emitted frame (its embedding is this chunk's first input).
    frame0: absolute index of this chunk's first frame — per-frame sampling
    keys are fold_in(key, frame index), so chunking doesn't change draws."""
    n = n_arr.shape[0]
    nc1 = model.audio_num_codebooks + 1

    def body(carry, k):
        caches, prev = carry
        b = prev.shape[0]
        tokens = jnp.concatenate(
            [prev, jnp.zeros((b, 1), dtype=prev.dtype)], axis=1
        )[:, None, :]                       # [B, 1, nc+1]
        tmask = jnp.concatenate(
            [jnp.ones_like(prev, dtype=bool), jnp.zeros((b, 1), dtype=bool)],
            axis=1,
        )[:, None, :]
        embeds = model.embed_tokens(tokens, tmask)
        frame, caches = model.generate_frame_step(
            caches, pad_len, embeds, k, temp, top_k
        )
        return (caches, frame), frame

    keys = jax.vmap(jax.random.fold_in, (None, 0))(
        key, frame0 + jnp.arange(n))
    (caches, _), frames = jax.lax.scan(body, (caches, last_frame), keys)
    return frames, caches


def sanitize_hf_csm(weights: dict) -> dict:
    """Map HF-transformers `CsmForConditionalGeneration` checkpoint keys
    (the sesame/csm-1b hub format) to our paths.  Embedded `codec_model.*`
    (Mimi) keys are routed through sanitize_hf_mimi onto the wrapper's
    `_mimi`; the depth decoder's duplicated audio-embedding table is
    dropped in favor of the shared backbone table (the original shares
    one, sesame.py:397-415).  Golden logits parity in
    tests/test_golden_hf.py."""
    codec = {k[len("codec_model."):]: v for k, v in weights.items()
             if k.startswith("codec_model.")}
    out = {}
    if codec:
        from mlx_audio_tpu.codec.mimi.mimi import sanitize_hf_mimi

        out.update({f"_mimi.{k}": v
                    for k, v in sanitize_hf_mimi(codec).items()})
    # HF ties the backbone and depth audio-embedding tables
    # (tie_codebooks_embeddings); save_pretrained dedupes the pair and may
    # keep EITHER key, so accept the depth copy when the backbone one is
    # absent
    has_backbone_audio = (
        "backbone_model.embed_tokens.embed_audio_tokens.weight" in weights
    )
    for k, v in weights.items():
        if k.startswith("codec_model."):
            continue
        if k == "depth_decoder.model.embed_tokens.weight":
            if has_backbone_audio:
                continue
            out["model.audio_embeddings.weight"] = np.asarray(v)
            continue
        v = np.asarray(v)
        if k == "embed_text_tokens.weight":
            k = "model.text_embeddings.weight"
        elif k == "backbone_model.embed_tokens.embed_audio_tokens.weight":
            k = "model.audio_embeddings.weight"
        elif k == "lm_head.weight":
            k = "model.codebook0_head.weight"
        elif k == "depth_decoder.codebooks_head.weight":
            k = "model.audio_head"
        elif k == "depth_decoder.model.inputs_embeds_projector.weight":
            k = "model.projection.weight"
        elif k.startswith("depth_decoder.model."):
            k = "model.decoder." + k[len("depth_decoder.model."):]
        elif k.startswith("backbone_model."):
            k = "model.backbone." + k[len("backbone_model."):]
        out[k] = v
    return out


def sanitize(weights: dict) -> dict:
    """Map the CSM torch/MLX checkpoint keys to our paths (reference
    sesame.py:543-570).  HF-transformers CSM checkpoints (backbone_model.*
    naming) are auto-detected."""
    if any(k.startswith("backbone_model.") for k in weights):
        return sanitize_hf_csm(weights)
    out = {}
    for k, v in weights.items():
        v = np.asarray(v)
        if not k.startswith("model."):
            k = "model." + k
        if "attn" in k and "self_attn" not in k:
            k = k.replace("attn", "self_attn").replace("output_proj", "o_proj")
        if "mlp" in k:
            k = k.replace("w1", "gate_proj").replace("w2", "down_proj").replace("w3", "up_proj")
        if "sa_norm" in k or "mlp_norm" in k:
            k = k.replace("sa_norm", "input_layernorm").replace("scale", "weight")
            k = k.replace("mlp_norm", "post_attention_layernorm").replace("scale", "weight")
        if "decoder.norm" in k or "backbone.norm" in k:
            k = k.replace("scale", "weight")
        out[k] = v
    return out
