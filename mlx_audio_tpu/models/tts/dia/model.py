"""Dia-1.6B — encoder-decoder dialogue TTS over 9 DAC codebooks, TPU-first.

Capability parity with /root/reference/mlx_audio/tts/models/dia/dia.py:
32-592: byte-level text encoding with [S1]/[S2] speaker tags, 2-row
(uncond/cond) classifier-free-guidance decoding, per-channel delay pattern,
EOS countdown tail, DAC synthesis.  The AR loop runs as jitted `lax.scan`
chunks with CFG + top-k sampling on device.
"""

from __future__ import annotations

import re
import time
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.models.base import make_generation_result
from mlx_audio_tpu.models.tts.dia.audio import (
    audio_to_codebook,
    codebook_to_audio,
    codebook_to_audio_batch,
)
from mlx_audio_tpu.models.tts.dia.config import DiaConfig
from mlx_audio_tpu.models.tts.dia.layers import DiaDecoder, DiaEncoder
from mlx_audio_tpu.nn import Module

_EXTRA_STEPS_AFTER_EOS = 30


def _null_cm():
    import contextlib

    return contextlib.nullcontext()


class DiaModel(Module):
    def __init__(self, config: DiaConfig):
        self.encoder = DiaEncoder(config)
        self.decoder = DiaDecoder(config)


@partial(jax.jit, static_argnames=("chunk", "temperature", "top_k",
                                   "cfg_scale", "force_bos"))
def _dia_chunk(model, sa_caches, cross_kvs, ca_mask, last_tokens, step0,
               gen_start, delay, key, bos_value, chunk: int,
               temperature: float, top_k: int, cfg_scale: float,
               force_bos: bool):
    """Scan `chunk` decode steps with CFG over interleaved (uncond, cond)
    row pairs: text b occupies rows (2b, 2b+1).

    last_tokens: [2B, C] codes fed at position step0 (the current step's
    input); returns sampled codes [chunk, B, C] (with delay-pattern BOS
    forcing applied in-graph, dia.py:521-526, so the fed-back tokens
    match).  Sampling keys are folded per text row, so a text's draw is
    independent of the batch size (dp padding keeps real rows exact)."""

    def body(carry, xs):
        caches_s, prev, step = carry
        k = xs
        logits, caches_s = model.decoder.step(
            prev[:, None, :], step[None, None], caches_s, cross_kvs,
            None, ca_mask,
        )
        logits = logits[:, -1]              # [2B, C, V]
        b = logits.shape[0] // 2
        pair = logits.reshape(b, 2, *logits.shape[1:])
        uncond, cond = pair[:, 0], pair[:, 1]        # [B, C, V]
        cfg = cond + cfg_scale * (cond - uncond)     # [B, C, V]
        v = cfg.shape[-1]
        # restrict to the 1025 valid classes (codes + EOS)
        ids = jnp.arange(v)[None, None, :]
        cfg = jnp.where(ids < 1025, cfg, -jnp.inf)
        if top_k > 0:
            # threshold only needs the k-th largest VALUE: lax.top_k's
            # partial selection replaces a full 1028-wide sort per step
            # (same value as sort(...)[-top_k] — masking is bit-identical)
            kth = jax.lax.top_k(cfg, top_k)[0][..., -1:]
            cfg = jnp.where(cfg < kth, -jnp.inf, cfg)
        if temperature == 0:
            pred = jnp.argmax(cfg, axis=-1).astype(jnp.int32)   # [B, C]
        else:
            keys = jax.vmap(jax.random.fold_in, (None, 0))(
                k, jnp.arange(b))
            pred = jax.vmap(
                lambda kk, z: jax.random.categorical(
                    kk, z / temperature, axis=-1)
            )(keys, cfg).astype(jnp.int32)
        if force_bos:
            gen_idx = step - gen_start
            pred = jnp.where(gen_idx >= delay[None], pred, bos_value)
        feed = jnp.repeat(pred, 2, axis=0)           # [2B, C] per-pair copy
        return (caches_s, feed, step + 1), pred

    keys = jax.random.split(key, chunk)
    (sa_caches, last, _), preds = jax.lax.scan(
        body, (sa_caches, last_tokens, step0), keys
    )
    return preds, sa_caches, last


def _trim_cross(cross_kvs, pad2, step: int = 64):
    """Slice the cross-attention keys down to a `step`-bucket covering the
    longest REAL text in the batch.

    The data config pads every text to text_length=1024 (training-time
    fixed shape); at decode the pad keys are masked to -1e9, whose f32
    softmax contribution underflows to exactly 0.0 — so dropping them is
    bit-exact while removing the dominant per-step HBM read at batch > 1
    (18 layers x 2B rows x 1024 keys of masked cross-KV; docs/PERF.md Dia
    section)."""
    s_len = pad2.shape[-1]
    s_real = int(np.asarray(jnp.sum(pad2, axis=-1)).max())
    sl = min(s_len, max(step, -(-s_real // step) * step))
    if sl >= s_len:
        return cross_kvs, pad2[:, None, None, :]
    cross_kvs = [(k[:, :, :sl], v[:, :, :sl]) for k, v in cross_kvs]
    return cross_kvs, pad2[:, None, None, :sl]


def _eos_tail(c: int, eos: int, pad_tok: int, delay) -> list:
    """Per-channel EOS/PAD countdown rows appended after the EOS frame
    (dia.py:545-573); the delay revert discards this tail region."""
    rows = []
    for extra in range(1, max(delay) + 1):
        row = np.full((c,), pad_tok, dtype=np.int32)
        for i, d in enumerate(delay):
            if extra == d:
                row[i] = eos
            elif extra < d:
                row[i] = 0
        rows.append(row)
    return rows


class Model(Module):
    def __init__(self, config, dac_model=None):
        if isinstance(config, DiaConfig):
            self.config = config
        else:
            self.config = DiaConfig.load_dict(config)
        self.model = DiaModel(self.config)
        self._dac = dac_model

    @property
    def sample_rate(self):
        return self.config.model.sample_rate

    def _get_dac(self):
        if self._dac is None:
            from mlx_audio_tpu.codec.dac import DAC

            # from_pretrained loads the WEIGHTS (reference dia.py:45);
            # constructing from config alone would decode through random
            # parameters
            self._dac = DAC.from_pretrained(
                "mlx-community/descript-audio-codec-44khz"
            )
        return self._dac

    def _decode_placement(self, batch: int = 1):
        """(model, mesh_cm, dp_ctx): the DiaModel to decode with, a context
        manager for jitted steps, and the mesh context when its data axis
        can shard a ``batch``-text decode (else None).  With tp > 1 the
        encoder/decoder DenseGeneral projections shard by tp_rules_dia
        (head-parallel attention, column/row-parallel MLP, vocab-split
        logits head) — Dia-1.6B's decoder is the second-largest resident
        LM in the suite; dp composes for the CFG row pairs over 'data'."""
        from mlx_audio_tpu.parallel.context import active_mesh
        from mlx_audio_tpu.parallel.mesh import tp_rules_dia

        ctx = active_mesh()
        dp = ctx if (ctx is not None and ctx.dp > 1 and batch > 1) else None
        if ctx is not None and ctx.tp > 1:
            return ctx.place_tp(self.model, tp_rules_dia), ctx.mesh, dp
        if dp is not None:
            return dp.place_replicated(self.model), dp.mesh, dp
        return self.model, _null_cm(), None

    # -- text prep (dia.py:171-203) ---------------------------------------

    def _prepare_text_input(self, text: str):
        pad = self.config.data.text_pad_value
        max_len = self.config.data.text_length
        b = text.encode("utf-8").replace(b"[S1]", b"\x01").replace(b"[S2]", b"\x02")
        tokens = list(b)[:max_len]
        padded = np.full(max_len, pad, dtype=np.int32)
        padded[: len(tokens)] = tokens
        src = jnp.asarray(padded)[None]
        positions = jnp.arange(max_len)[None]
        pad_mask = src != pad
        # segment-compatible mask: non-pad<->non-pad or pad<->pad
        q = pad_mask[:, :, None]
        kk = pad_mask[:, None, :]
        mask = (q & kk) | (~q & ~kk)
        return src, positions, pad_mask, mask[:, None]

    def _split_turns(self, text: str) -> List[str]:
        pattern = re.compile(
            r"\[S1\]\s*(.*?)\s*\[S2\]\s*(.*?)(?=(?:\[S1\])|$)", re.DOTALL
        )
        segments = [
            f"[S1] {a.strip()} [S2] {b.strip()}" for a, b in pattern.findall(text)
        ]
        if len(segments) > 1:
            merged = []
            for i in range(0, len(segments), 2):
                if i + 1 < len(segments):
                    merged.append(f"{segments[i]} {segments[i + 1]}")
                else:
                    merged.append(segments[i])
            segments = merged
        return segments

    # -- generation --------------------------------------------------------

    def _generate(self, text: str, max_tokens: Optional[int] = None,
                  cfg_scale: float = 3.0, temperature: float = 1.3,
                  cfg_filter_top_k: int = 35, ref_audio=None,
                  ref_text: Optional[str] = None, seed: int = 0):
        data = self.config.data
        c = data.channels
        bos, eos, pad_tok = data.audio_bos_value, data.audio_eos_value, data.audio_pad_value
        delay = data.delay_pattern
        max_delay = max(delay)
        max_tokens = max_tokens or data.audio_length

        if ref_text is not None:
            text = ref_text.strip() + " " + text

        src, src_pos, src_pad_mask, enc_mask = self._prepare_text_input(text)
        # 2-row batch: row 0 unconditional (zeroed text), row 1 conditional
        src2 = jnp.concatenate([jnp.zeros_like(src), src], axis=0)
        src_pos2 = jnp.concatenate([src_pos, src_pos], axis=0)
        pad2 = jnp.concatenate([src_pad_mask, src_pad_mask], axis=0)
        enc_mask2 = jnp.concatenate([enc_mask, enc_mask], axis=0)

        run_model, mesh_cm, _ = self._decode_placement()
        with mesh_cm:
            encoder_out, cross_kvs = _encode_text_jit(
                run_model, src2, src_pos2, enc_mask2
            )
            # decode-step cross mask: query (generated, non-pad) attends
            # non-pad keys — with the masked pad tail sliced away (bit-exact)
            cross_kvs, ca_mask = _trim_cross(cross_kvs, pad2)

        generated = [np.full((c,), bos, dtype=np.int32)]  # BOS frame
        current_step = 0

        prompt_np = None
        if ref_audio is not None:
            prompt_codes = audio_to_codebook(
                self._get_dac(), jnp.asarray(ref_audio, jnp.float32)[None, None],
                data,
            )  # [1, T, C]
            prompt_np = np.asarray(prompt_codes)[0]
        # cache must hold BOS + prompt frames + generated frames (a
        # max_tokens-only cache silently clamps writes once the prompt is
        # longer than the slack)
        n_prompt = 0 if prompt_np is None else prompt_np.shape[0]
        cache_len = max_tokens + n_prompt + 64
        # cache follows the weight dtype (f32 cache under bf16 weights
        # doubles per-step HBM reads)
        wdtype = jax.tree_util.tree_leaves(run_model.decoder)[0].dtype
        sa_caches = run_model.decoder.init_cache(2, cache_len,
                                                 dtype=wdtype)

        if ref_audio is not None:
            frames = np.concatenate([generated[0][None], prompt_np], axis=0)
            tgt = jnp.asarray(np.stack([frames, frames]))  # [2, T, C]
            t = tgt.shape[1]
            positions = jnp.arange(t)[None].repeat(2, 0)
            i = jnp.arange(t)[:, None]
            j = jnp.arange(cache_len)[None, :]
            sa_mask = ((j <= i) & (j < t))[None, None]
            with mesh_cm:
                _, sa_caches = _prefill_decoder_jit(
                    run_model, tgt, positions, sa_caches, cross_kvs, sa_mask,
                    ca_mask
                )
            generated = [f for f in frames]
            current_step = t - 1
            # rewind: the last frame is re-fed as the next step's input
            sa_caches = [cc._replace(idx=jnp.asarray(t - 1, jnp.int32))
                         for cc in sa_caches]

        key = jax.random.PRNGKey(seed)
        last = jnp.asarray(np.stack([generated[-1], generated[-1]]))
        step = current_step
        out_frames = list(generated)
        eos_seen = False
        while (step - current_step) < max_tokens and not eos_seen:
            n = min(64, max_tokens - (step - current_step))
            key, kc = jax.random.split(key)
            with mesh_cm:
                preds, sa_caches, last = _dia_chunk(
                    run_model, sa_caches, cross_kvs, ca_mask, last,
                    jnp.asarray(step, jnp.int32),
                    jnp.asarray(current_step, jnp.int32), jnp.asarray(delay),
                    kc, bos, chunk=int(n), temperature=temperature,
                    top_k=cfg_filter_top_k, cfg_scale=cfg_scale,
                    force_bos=ref_audio is None,
                )
            preds_np = np.asarray(preds)[:, 0]  # [n, C]
            for row in preds_np:
                out_frames.append(row.astype(np.int32))
                step += 1
                if row[0] == eos:
                    eos_seen = True
                    break

        # EOS tail: force EOS/PAD per channel delay (dia.py:545-573).  NB the
        # reference keeps sampling the not-yet-EOS channels during the
        # countdown; we fill them with code 0 — the revert step discards the
        # last 30 frames, which covers the max_delay=15 tail.
        if eos_seen:
            out_frames.extend(_eos_tail(c, eos, pad_tok, delay))

        # voice cloning: exclude the reference-prompt frames from the
        # output (reference dia.py:581 slices them off); keep the BOS
        # column codebook_to_audio drops
        if n_prompt:
            out_frames = [out_frames[0]] + out_frames[1 + n_prompt:]
        codes = np.stack(out_frames, axis=1)  # [C, T]
        audio = codebook_to_audio(codes, self._get_dac(), delay, c=c)
        return audio, len(out_frames)

    def generate_batch(self, texts: List[str],
                       max_tokens: Optional[int] = None,
                       cfg_scale: float = 3.0, temperature: float = 1.3,
                       cfg_filter_top_k: int = 35, seed: int = 0,
                       **kwargs) -> list:
        """Batched dialogue synthesis: B texts decode in one jitted CFG
        loop over 2B interleaved (uncond, cond) rows, sharing every
        decoder weight fetch.  Under an active mesh with dp > 1 the text
        batch pads to a dp multiple and row pairs shard over 'data' with
        the weights replicated; per-text fold_in sampling keys keep real
        rows exact.  Per-text EOS is tracked on host between chunks; DAC
        synthesis runs per text (lengths are ragged).  New capability vs
        the reference (strictly single-text, dia.py:230)."""
        data = self.config.data
        c = data.channels
        bos, eos, pad_tok = (data.audio_bos_value, data.audio_eos_value,
                             data.audio_pad_value)
        delay = data.delay_pattern
        max_tokens = max_tokens or data.audio_length
        start_time = time.perf_counter()

        b = len(texts)
        run_model, mesh_cm, dp = self._decode_placement(batch=b)
        run_texts = list(texts)
        if dp is not None:
            while len(run_texts) % dp.dp:
                run_texts.append(run_texts[-1])     # pad rows, dropped below
        bn = len(run_texts)

        srcs, pads, masks = [], [], []
        for t in run_texts:
            src, src_pos, pad_mask, enc_mask = self._prepare_text_input(t)
            srcs.append(src)
            pads.append(pad_mask)
            masks.append(enc_mask)
        src = jnp.concatenate(srcs, axis=0)          # [Bn, S]
        pad_mask = jnp.concatenate(pads, axis=0)
        enc_mask = jnp.concatenate(masks, axis=0)
        # bucket the ENCODER length to the longest real text (128-step
        # buckets): the data config pads to text_length=1024, and the
        # bidirectional self-attention over 2B padded rows is quadratic —
        # at batch 32 the [64, H, 1024, 1024] score tensors alone OOM the
        # chip.  Real positions never attend pad keys (segment mask
        # above) and cross-attention masks pad KV, so truncating pads is
        # exact for the decoded audio — same argument as _trim_cross.
        s_real = int(np.asarray(jnp.sum(pad_mask, axis=-1)).max())
        s_bucket = min(src.shape[1], max(128, -(-s_real // 128) * 128))
        # test hook: force a specific encoder length (exactness gate)
        s_bucket = int(kwargs.pop("_encoder_bucket", s_bucket))
        if s_bucket < src.shape[1]:
            src = src[:, :s_bucket]
            pad_mask = pad_mask[:, :s_bucket]
            enc_mask = enc_mask[:, :, :s_bucket, :s_bucket]
        s_len = src.shape[1]
        # interleave (uncond, cond) per text: rows (2b, 2b+1)
        src2 = jnp.stack([jnp.zeros_like(src), src], axis=1).reshape(
            2 * bn, s_len)
        pad2 = jnp.repeat(pad_mask, 2, axis=0)
        enc_mask2 = jnp.repeat(enc_mask, 2, axis=0)
        src_pos2 = jnp.broadcast_to(jnp.arange(s_len)[None], (2 * bn, s_len))

        cache_len = max_tokens + 64
        wdtype = jax.tree_util.tree_leaves(run_model.decoder)[0].dtype
        sa_caches = run_model.decoder.init_cache(2 * bn, cache_len,
                                                 dtype=wdtype)
        if dp is not None:
            src2, src_pos2, pad2, enc_mask2 = dp.shard_batch(
                src2, src_pos2, pad2, enc_mask2)
            sa_caches = dp.shard_batch_tree(sa_caches, 2 * bn)
        with mesh_cm:
            encoder_out, cross_kvs = _encode_text_jit(
                run_model, src2, src_pos2, enc_mask2)
            cross_kvs, ca_mask = _trim_cross(cross_kvs, pad2)

        key = jax.random.PRNGKey(seed)
        first = np.full((c,), bos, dtype=np.int32)
        out_frames = [[first.copy()] for _ in range(bn)]
        done = np.zeros((bn,), dtype=bool)
        last = jnp.asarray(np.broadcast_to(first, (2 * bn, c)).copy())
        if dp is not None:
            last = dp.shard_batch(last)
        step = 0
        while step < max_tokens and not done[:b].all():
            n = min(64, max_tokens - step)
            key, kc = jax.random.split(key)
            with mesh_cm:
                preds, sa_caches, last = _dia_chunk(
                    run_model, sa_caches, cross_kvs, ca_mask, last,
                    jnp.asarray(step, jnp.int32),
                    jnp.asarray(0, jnp.int32), jnp.asarray(delay), kc,
                    bos, chunk=int(n), temperature=temperature,
                    top_k=cfg_filter_top_k, cfg_scale=cfg_scale,
                    force_bos=True,
                )
            preds_np = np.asarray(preds)   # [n, Bn, C]
            for row in preds_np:
                for i in range(bn):
                    if done[i]:
                        continue
                    out_frames[i].append(row[i].astype(np.int32))
                    if row[i][0] == eos:
                        done[i] = True
                step += 1

        dac = self._get_dac()
        codes_list = []
        for i in range(b):
            frames = out_frames[i]
            if done[i]:
                frames = frames + _eos_tail(c, eos, pad_tok, delay)
            codes_list.append(np.stack(frames, axis=1))   # [C, T]
        # equal-length rows synthesize through ONE batched DAC call
        audios = codebook_to_audio_batch(codes_list, dac, delay, c=c)
        elapsed = time.perf_counter() - start_time
        results = []
        for i in range(b):
            results.append(make_generation_result(
                audios[i], self.config.model.sample_rate, i,
                codes_list[i].shape[1], elapsed / b,
            ))
        return results

    def generate(self, text: str, temperature: float = 1.3, top_p: float = 0.95,
                 split_pattern: str = "\n", max_tokens: Optional[int] = None,
                 ref_audio=None, ref_text: Optional[str] = None,
                 cfg_scale: float = 3.0, seed: int = 0, **kwargs):
        prompt = text.replace("\\n", "\n").replace("\\t", "\t")
        prompts = prompt.split(split_pattern)
        segments = []
        for p in prompts:
            if "[S1]" in p and "[S2]" in p:
                segments.extend(self._split_turns(p))
            else:
                segments.append(p)
        for seg_idx, segment in enumerate(segments):
            start = time.perf_counter()
            audio, token_count = self._generate(
                segment, max_tokens=max_tokens, cfg_scale=cfg_scale,
                temperature=temperature, ref_audio=ref_audio,
                ref_text=ref_text, seed=seed + seg_idx,
            )
            yield make_generation_result(
                audio, self.config.model.sample_rate, seg_idx, token_count,
                time.perf_counter() - start,
            )

    def sanitize(self, weights: dict) -> dict:
        """Original nari-labs checkpoints already use our DenseGeneral
        layouts.  HF-transformers `DiaForConditionalGeneration` checkpoints
        (nari-labs/Dia-1.6B hub format: flattened 2-D projections, fused
        embeddings) are auto-detected and reshaped."""
        if any(".mlp.gate_up_proj." in k or "embeddings.embed." in k
               for k in weights):
            return sanitize_hf_dia(weights, self.config)
        return {k if k.startswith("model.") else f"model.{k}": np.asarray(v)
                for k, v in weights.items()}


def sanitize_hf_dia(weights: dict, config) -> dict:
    """Map HF-transformers Dia checkpoints to our DenseGeneral layouts.

    HF flattens every projection to 2-D torch Linear layout; we reshape to
    the original jax DenseGeneral axes: q/k/v [D, H, hd], o [H, hd, D],
    gate_up [D, 2, hidden], down [hidden, D], fused channel embeddings and
    logits head split per channel.  Golden parity in tests/test_golden_hf.py.
    """
    enc, dec = config.model.encoder, config.model.decoder
    channels = config.data.channels
    tgt_v = config.model.tgt_vocab_size

    def qkv(v, heads, hd):
        return v.T.reshape(v.shape[1], heads, hd)

    out = {}
    for k, v in weights.items():
        v = np.asarray(v)
        k = k.removeprefix("model.")
        if k == "logits_dense.weight":
            out["model.decoder.logits_dense.weight"] = v.T.reshape(
                v.shape[1], channels, tgt_v)
            continue
        if k == "decoder.embeddings.embed.weight":
            for c in range(channels):
                out[f"model.decoder.embeddings.{c}.weight"] = (
                    v[c * tgt_v:(c + 1) * tgt_v])
            continue
        if ".self_attention." in k or ".cross_attention." in k:
            is_enc = k.startswith("encoder.")
            is_cross = ".cross_attention." in k
            if is_enc:
                h, hd, kvh, kvd = enc.n_head, enc.head_dim, enc.n_head, enc.head_dim
            elif is_cross:
                h, hd = dec.cross_query_heads, dec.cross_head_dim
                kvh, kvd = dec.cross_query_heads, dec.cross_head_dim
            else:
                h, hd = dec.gqa_query_heads, dec.gqa_head_dim
                kvh, kvd = dec.kv_heads, dec.gqa_head_dim
            if k.endswith("q_proj.weight"):
                v = qkv(v, h, hd)
            elif k.endswith("k_proj.weight") or k.endswith("v_proj.weight"):
                v = qkv(v, kvh, kvd)
            elif k.endswith("o_proj.weight"):
                v = v.T.reshape(h, hd, v.shape[0])
        elif k.endswith(".mlp.gate_up_proj.weight"):
            k = k.replace(".gate_up_proj.", ".wi_fused.")
            v = v.T.reshape(v.shape[1], 2, v.shape[0] // 2)
        elif k.endswith(".mlp.down_proj.weight"):
            k = k.replace(".down_proj.", ".wo.")
            v = v.T
        out["model." + k] = v
    return out


@jax.jit
def _encode_text_jit(model, src, src_pos, enc_mask):
    """Jitted encoder + cross-KV precompute (model as pytree arg — eager
    calls re-trace with weights as constants; docs/PERF.md)."""
    encoder_out = model.encoder(src, src_pos, enc_mask)
    return encoder_out, model.decoder.precompute_cross_kv(encoder_out, src_pos)


@jax.jit
def _prefill_decoder_jit(model, tgt, positions, sa_caches, cross_kvs,
                         sa_mask, ca_mask):
    """Jitted audio-prompt prefill (voice-clone path)."""
    return model.decoder.step(tgt, positions, sa_caches, cross_kvs, sa_mask,
                              ca_mask)
