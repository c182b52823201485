"""On-device deployment artifacts via jax.export (StableHLO).

The reference ships a Swift/MLX on-device port (`mlx_audio_swift/`,
~13.1k LoC) so apps can run TTS without the Python stack.  The TPU-native
analogue of "on device" is a serialized, ahead-of-time-exported inference
program: `jax.export` captures the jitted graph with the weights baked in
as constants, producing a single artifact that any JAX runtime (TPU
server, CPU edge box, IREE-class StableHLO consumers) can load and call
WITHOUT this package's model code or the checkpoint.

    # build + save (one artifact per shape bucket; weights inside)
    python -m mlx_audio_tpu.export --model <kokoro-dir> \
        --out kokoro.jaxexp --phoneme-bucket 512 --frame-bucket 1300

    # serve anywhere (only jax + the artifact needed)
    from mlx_audio_tpu.export import load_program
    synth = load_program("kokoro.jaxexp")
    audio, pred_dur = synth(input_ids, lengths, ref_s, speeds, key_data)

Exported programs have static shapes by design (the on-device tradeoff —
the host picks the artifact for its bucket, exactly like the Swift port
pins its model graphs).  G2P/voice loading stay host-side, as they do in
the reference's Swift port.
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "export_program",
    "load_program",
    "kokoro_synthesis_fn",
    "export_kokoro",
    "mimi_decode_fn",
    "export_mimi_decode",
    "export_mimi_stream_decode",
    "export_causal_session",
    "export_snac_decode",
    "export_orpheus",
    "export_whisper_greedy",
]


def export_program(fn, example_args: Sequence, path,
                   platforms: Sequence[str] = ("tpu", "cpu")) -> int:
    """Serialize jit(fn)(*example_args) to `path` for the given lowering
    platforms.  Returns the artifact size in bytes."""
    from jax import export as jexport

    exp = jexport.export(jax.jit(fn), platforms=list(platforms))(
        *example_args)
    data = exp.serialize()
    Path(path).write_bytes(data)
    return len(data)


def load_program(path):
    """Load a serialized program; returns a callable of the exported
    signature.  Needs only jax — no model code, no checkpoint."""
    from jax import export as jexport

    exp = jexport.deserialize(Path(path).read_bytes())
    return exp.call


# ---------------------------------------------------------------------------
# Kokoro: phonemes -> waveform, weights baked
# ---------------------------------------------------------------------------


def kokoro_synthesis_fn(model, frame_bucket: int):
    """Whole-graph synthesis closure over `model` (weights become artifact
    constants): (input_ids [B, P], lengths [B], ref_s [B, 256], speeds [B],
    key [2] uint32) -> (audio [B, 600*F], pred_dur [B, P])."""
    from mlx_audio_tpu.models.tts.kokoro.model import (
        _duration_body,
        _synthesis_body,
    )

    def fn(input_ids, lengths, ref_s, speeds, key):
        # key: legacy threefry key bits, uint32 [2]
        d, pred_dur = _duration_body(model, input_ids, lengths,
                                     ref_s[:, 128:], speeds)
        audio, _ = _synthesis_body(
            model, input_ids, lengths, d, pred_dur, ref_s, key,
            jnp.zeros((frame_bucket,), dtype=jnp.int32),
        )
        return audio, pred_dur

    return fn


def export_kokoro(model, out_path, batch: int = 1,
                  phoneme_bucket: int = 512, frame_bucket: int = 1300,
                  platforms: Sequence[str] = ("tpu", "cpu")) -> int:
    """Export one (batch, phoneme_bucket, frame_bucket) Kokoro program."""
    b = batch
    example = (
        jnp.zeros((b, phoneme_bucket), jnp.int32),      # input_ids
        jnp.ones((b,), jnp.int32),                      # lengths
        jnp.zeros((b, 256), jnp.float32),               # ref_s
        jnp.ones((b,), jnp.float32),                    # speeds
        jax.random.PRNGKey(0),                          # key bits uint32[2]
    )
    return export_program(kokoro_synthesis_fn(model, frame_bucket),
                          example, out_path, platforms)


# ---------------------------------------------------------------------------
# Mimi: RVQ codes -> waveform (the CSM vocoder half), weights baked
# ---------------------------------------------------------------------------


def mimi_decode_fn(mimi):
    def fn(codes):
        return mimi._decode_impl(codes)

    return fn


def export_mimi_decode(mimi, out_path, batch: int = 1, frames: int = 63,
                       platforms: Sequence[str] = ("tpu", "cpu")) -> int:
    nq = getattr(mimi.cfg, "quantizer_nq", 32)
    example = (jnp.zeros((batch, nq, frames), jnp.int32),)
    return export_program(mimi_decode_fn(mimi), example, out_path,
                          platforms)


def export_mimi_stream_decode(mimi, out_path, batch: int = 1,
                              chunk_frames: int = 32,
                              platforms: Sequence[str] = ("tpu", "cpu")) -> dict:
    """Export the STATEFUL chunked Mimi decode: (codes [B, nq, n],
    *flat_state) -> (audio [B, 1, n*1920], *flat_state).

    This is the streaming half the batch `export_mimi_decode` artifact
    can't provide: successive chunks continue ONE conv/transformer stream,
    so on-device chunked decode is seamless — the guarantee the reference
    implements with MimiStreamingDecoder (/root/reference/mlx_audio/codec/
    models/mimi/mimi.py:264-306) — instead of O(n^2) re-decode or chunk
    seams.  The ConvState/ConvTrState/KV-cache pytrees cross the export
    boundary as flat arrays; a JSON sidecar records their shapes/dtypes so
    a consumer can zero-init them without model code."""
    import json

    state0 = mimi.init_state(batch)
    # only the decode half of MimiState crosses the boundary; the encoder
    # half stays a baked constant (the decode path never touches it)
    sub0 = (state0.upsample, state0.decoder_tf, state0.decoder)
    flat, treedef = jax.tree_util.tree_flatten(sub0)

    def decode_chunk(codes, *flat_state):
        up, dtf, dec = jax.tree_util.tree_unflatten(treedef, flat_state)
        state = state0._replace(upsample=up, decoder_tf=dtf, decoder=dec)
        audio, state = mimi._decode_frames_stateful_impl(codes, state)
        out = (state.upsample, state.decoder_tf, state.decoder)
        return (audio, *jax.tree_util.tree_leaves(out))

    nq = getattr(mimi.cfg, "quantizer_nq", 32)
    example = (jnp.zeros((batch, nq, chunk_frames), jnp.int32), *flat)
    n = export_program(decode_chunk, example, out_path, platforms)

    def leaf_init(x):
        v = np.asarray(x)
        if v.ndim == 0:          # scalar flags (e.g. stream-start markers)
            return v.item()
        if v.any():
            raise ValueError("non-scalar state leaf with non-zero init")
        return "zeros"

    meta = {
        "chunk_frames": chunk_frames,
        "batch": batch,
        "nq": nq,
        "samples_per_frame": int(mimi.samples_per_frame),
        "state_shapes": [list(x.shape) for x in flat],
        "state_dtypes": [str(x.dtype) for x in flat],
        "state_init": [leaf_init(x) for x in flat],
    }
    with open(f"{out_path}.meta.json", "w") as f:
        json.dump(meta, f, indent=1)
    return {"bytes": n, **meta}


# ---------------------------------------------------------------------------
# CSM session: prefill + frame-chunk programs (the on-device analogue of
# the Swift port's SesameSession, mlx_audio_swift README.md:262-301) —
# caches cross the export boundary as flat arrays so loading needs no
# model classes; a JSON sidecar records shapes for host-side cache init.
# ---------------------------------------------------------------------------


def _flat_caches(caches) -> tuple:
    return tuple(x for c in caches for x in (c.k, c.v, c.idx))


def csm_session_fns(model, temp: float = 0.9, top_k: int = 50):
    """(prefill_fn, chunk_fn) closures over the CSM lm (weights baked).

    prefill(tokens [B,T,nc+1] i32, mask bool, pad_len [B] i32, key u32[2],
            *flat_caches) -> (frame [B, nc], *flat_caches)
    chunk(last_frame [B, nc], pad_len, key, *flat_caches)
            -> (frames [n, B, nc], *flat_caches)
    An all-zero frame is EOS (reference sesame.py:779)."""
    from mlx_audio_tpu.models.tts.sesame.model import (
        _frame_chunk,
        _prefill_and_first_frame,
    )
    from mlx_audio_tpu.nn.attention import KVCache

    def rebuild(flat):
        return [KVCache(k=flat[3 * i], v=flat[3 * i + 1], idx=flat[3 * i + 2])
                for i in range(len(flat) // 3)]

    def prefill(tokens, mask, pad_len, key, *flat_caches):
        frame, caches = _prefill_and_first_frame(
            model, rebuild(flat_caches), pad_len, tokens, mask, key,
            temp, top_k)
        return (frame, *_flat_caches(caches))

    def chunk(last_frame, pad_len, key, *flat_caches, n: int):
        frames, caches = _frame_chunk(
            model, rebuild(flat_caches), pad_len, last_frame, key, temp,
            top_k, jnp.zeros((n,), dtype=jnp.int32))
        return (frames, *_flat_caches(caches))

    return prefill, chunk


def export_csm_session(model, out_prefix, prompt_bucket: int = 256,
                       max_frames: int = 1125, chunk_frames: int = 32,
                       temp: float = 0.9, top_k: int = 50, batch: int = 1,
                       platforms: Sequence[str] = ("tpu", "cpu")) -> dict:
    """Write <prefix>.prefill / <prefix>.chunk / <prefix>.meta.json.
    `model`: the SesameModel (Model.model).  Mimi decode is exported
    separately with export_mimi_decode."""
    import json

    lm = model
    nc = lm.audio_num_codebooks
    wdtype = lm.lm_dtype()
    caches = lm.backbone.init_cache(batch,
                                    max_len=prompt_bucket + max_frames,
                                    dtype=wdtype)
    flat = _flat_caches(caches)
    prefill, chunk = csm_session_fns(lm, temp=temp, top_k=top_k)

    pre_args = (
        jnp.zeros((batch, prompt_bucket, nc + 1), jnp.int32),
        jnp.zeros((batch, prompt_bucket, nc + 1), bool),
        jnp.zeros((batch,), jnp.int32),
        jax.random.PRNGKey(0),
        *flat,
    )
    n1 = export_program(prefill, pre_args, f"{out_prefix}.prefill",
                        platforms)
    import functools

    chunk_args = (
        jnp.zeros((batch, nc), jnp.int32),
        jnp.zeros((batch,), jnp.int32),
        jax.random.PRNGKey(0),
        *flat,
    )
    n2 = export_program(functools.partial(chunk, n=chunk_frames),
                        chunk_args, f"{out_prefix}.chunk", platforms)
    meta = {
        "audio_num_codebooks": nc,
        "prompt_bucket": prompt_bucket,
        "chunk_frames": chunk_frames,
        "batch": batch,
        "rng": "prefill and each chunk call take a PRNG key; pass a FRESH key per call, e.g. jax.random.fold_in(session_key, call_index) — reusing one key replays the identical per-step key schedule every chunk (repetitive audio at temp>0)",
        "cache_shapes": [list(x.shape) for x in flat],
        "cache_dtypes": [str(x.dtype) for x in flat],
        "eos": "all-zero frame",
        "frame_ms": 80,
    }
    with open(f"{out_prefix}.meta.json", "w") as f:
        json.dump(meta, f, indent=1)
    return {"prefill_bytes": n1, "chunk_bytes": n2, **meta}


# ---------------------------------------------------------------------------
# Generic causal-LM session (Orpheus / OuteTTS / Spark LM loop) + SNAC —
# on-device analogue of the Swift port's OrpheusTTSModel
# (mlx_audio_swift/tts/Tests/Swift_TTS_Tests.swift:23-30)
# ---------------------------------------------------------------------------


def causal_session_fns(lm, temp: float, top_k: int, top_p: float):
    """(prefill_fn, chunk_fn) closures over a LlamaForCausalLM.

    prefill(input_ids [B,T] i32, pad_len [B] i32, key u32[2], *flat_caches)
            -> (first_token [B], *flat_caches)
    chunk(last [B], pad_len, key, *flat_caches, n) -> (toks [n,B], *flat)
    Stop-token handling is the consumer's (host) job, as in the in-process
    loop (models/lm/causal.py)."""
    from mlx_audio_tpu.models.lm.causal import _prefill, _sample_first
    from mlx_audio_tpu.models.sampling import (
        sample_top_k_rows,
        sample_top_p_rows,
    )
    from mlx_audio_tpu.nn.attention import KVCache

    def rebuild(flat):
        return [KVCache(k=flat[3 * i], v=flat[3 * i + 1], idx=flat[3 * i + 2])
                for i in range(len(flat) // 3)]

    def prefill(input_ids, pad_len, key, *flat_caches):
        logits, caches = _prefill(lm, rebuild(flat_caches), pad_len,
                                  input_ids)
        first = _sample_first(key, logits, temp, top_k, top_p)
        return (first, *_flat_caches(caches))

    def chunk(last, pad_len, key, *flat_caches, n: int):
        caches = rebuild(flat_caches)

        def body(carry, k):
            caches_s, prev = carry
            h, caches_s = lm.model.step(caches_s, prev[:, None], pad_len)
            logits = lm.logits(h[:, -1]).astype(jnp.float32)
            if temp == 0:
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            elif top_p < 1.0:
                tok = sample_top_p_rows(k, logits, temp, top_p)
            else:
                tok = sample_top_k_rows(k, logits, temp, top_k)
            return (caches_s, tok), tok

        keys = jax.random.split(key, n)
        (caches, last), toks = jax.lax.scan(body, (caches, last), keys)
        return (toks, *_flat_caches(caches))

    return prefill, chunk


def export_causal_session(lm, out_prefix, prompt_bucket: int = 128,
                          max_tokens: int = 1200, chunk_tokens: int = 64,
                          temp: float = 0.6, top_k: int = 0,
                          top_p: float = 1.0, batch: int = 1,
                          extra_meta: Optional[dict] = None,
                          platforms: Sequence[str] = ("tpu", "cpu")) -> dict:
    """Write <prefix>.prefill / <prefix>.chunk / <prefix>.meta.json for a
    causal-LM token session (weights baked)."""
    import functools
    import json

    from mlx_audio_tpu.models.lm.causal import lm_dtype

    caches = lm.model.init_cache(batch, max_len=prompt_bucket + max_tokens,
                                 dtype=lm_dtype(lm))
    flat = _flat_caches(caches)
    prefill, chunk = causal_session_fns(lm, temp, top_k, top_p)
    pre_args = (
        jnp.zeros((batch, prompt_bucket), jnp.int32),
        jnp.zeros((batch,), jnp.int32),
        jax.random.PRNGKey(0),
        *flat,
    )
    n1 = export_program(prefill, pre_args, f"{out_prefix}.prefill",
                        platforms)
    chunk_args = (
        jnp.zeros((batch,), jnp.int32),
        jnp.zeros((batch,), jnp.int32),
        jax.random.PRNGKey(0),
        *flat,
    )
    n2 = export_program(functools.partial(chunk, n=chunk_tokens),
                        chunk_args, f"{out_prefix}.chunk", platforms)
    meta = {
        "prompt_bucket": prompt_bucket,
        "chunk_tokens": chunk_tokens,
        "batch": batch,
        "rng": "prefill and each chunk call take a PRNG key; pass a FRESH key per call, e.g. jax.random.fold_in(session_key, call_index) — reusing one key replays the identical per-step key schedule every chunk (repetitive audio at temp>0)",
        "cache_shapes": [list(x.shape) for x in flat],
        "cache_dtypes": [str(x.dtype) for x in flat],
        **(extra_meta or {}),
    }
    with open(f"{out_prefix}.meta.json", "w") as f:
        json.dump(meta, f, indent=1)
    return {"prefill_bytes": n1, "chunk_bytes": n2, **meta}


def export_snac_decode(snac, out_path, frames: int = 64, batch: int = 1,
                       platforms: Sequence[str] = ("tpu", "cpu")) -> int:
    """Export SNAC decode: three code streams at strides (4, 2, 1) of the
    frame count -> waveform [B, 1, samples]."""
    strides = list(snac.vq_strides)

    def fn(*codes):
        return snac.decode(list(codes))

    example = tuple(
        jnp.zeros((batch, frames // s), jnp.int32) for s in strides
    )
    return export_program(fn, example, out_path, platforms)


def export_orpheus(model, out_prefix, prompt_bucket: int = 128,
                   max_tokens: int = 1200, chunk_tokens: int = 64,
                   snac_frames: int = 64, batch: int = 1,
                   platforms: Sequence[str] = ("tpu", "cpu")) -> dict:
    """Orpheus on-device set: the LM token session + the SNAC vocoder
    program + a meta sidecar carrying the 7-token frame constants the
    host needs to parse codes out of the token stream
    (models/tts/llama/llama.py)."""
    from mlx_audio_tpu.models.tts.llama.llama import (
        AUDIO_MARK,
        CODE_OFFSET,
        STOP_AUDIO,
    )

    info = export_causal_session(
        model.lm, out_prefix, prompt_bucket=prompt_bucket,
        max_tokens=max_tokens, chunk_tokens=chunk_tokens,
        temp=0.6, top_p=0.8, batch=batch,
        extra_meta={
            "family": "orpheus",
            "stop_token": int(STOP_AUDIO),
            "audio_mark": int(AUDIO_MARK),
            "code_offset": int(CODE_OFFSET),
            "codes_per_frame": 7,
            "snac_program": f"{out_prefix}.snac",
        },
        platforms=platforms,
    )
    info["snac_bytes"] = export_snac_decode(
        model._snac, f"{out_prefix}.snac", frames=snac_frames, batch=1,
        platforms=platforms)
    return info


# ---------------------------------------------------------------------------
# Whisper greedy window decode — the STT path as one exported program
# ---------------------------------------------------------------------------


def whisper_greedy_fn(model, tokenizer, sample_len: int = 224):
    """mel [B, 3000, n_mels] f32 -> (tokens [B, L], t_end, sum_logprob [B],
    no_speech_prob [B]) — encoder + cross-KV + prefill + the jitted greedy
    loop with the standard logit filters, language/task fixed at export
    time.  Host-side finalize (slice at sample_begin, cut at EOT, decode
    text) is recorded in the meta sidecar."""
    from mlx_audio_tpu.models.stt.whisper.api import (
        _bucket,
        _initial_tokens,
        _suppress_token_list,
    )
    from mlx_audio_tpu.models.stt.whisper.audio import CHUNK_LENGTH
    from mlx_audio_tpu.models.stt.whisper.decoding import (
        DecodingOptions,
        FilterConfig,
        greedy_decode_loop,
    )

    options = DecodingOptions(language=tokenizer.language, temperature=0.0,
                              sample_len=sample_len)
    n_ctx = model.dims.n_text_ctx
    initial = list(_initial_tokens(tokenizer, options, n_ctx, sample_len))
    sot_index = initial.index(tokenizer.sot)
    n_init = len(initial)
    bucket = _bucket(n_init)
    cfg = FilterConfig(
        eot=tokenizer.eot,
        timestamp_begin=tokenizer.timestamp_begin,
        no_timestamps=tokenizer.no_timestamps,
        max_initial_timestamp_index=round(
            1.0 / (CHUNK_LENGTH / model.dims.n_audio_ctx)),
        apply_timestamp_rules=True,
    )
    n_vocab = model.dims.n_vocab
    suppress_mask = np.zeros((n_vocab,), np.float32)
    suppress_mask[list(_suppress_token_list(tokenizer, options))] = -np.inf
    blank_mask = np.zeros((n_vocab,), np.float32)
    blank_mask[tokenizer.encode(" ") + [tokenizer.eot]] = -np.inf
    suppress_mask = jnp.asarray(suppress_mask)
    blank_mask = jnp.asarray(blank_mask)
    buf_len = bucket + sample_len + 1
    no_speech = tokenizer.no_speech

    def fn(mel):
        b = mel.shape[0]
        from mlx_audio_tpu.models.stt.whisper.api import _encode_mel, _prefill_jit

        features = _encode_mel(model, mel)
        tokens0 = jnp.broadcast_to(
            jnp.asarray(
                initial + [tokenizer.eot] * (buf_len - n_init), jnp.int32),
            (b, buf_len),
        )
        cross_kv = model.decoder.compute_cross_kv(features)
        caches = model.decoder.init_cache(b, buf_len, dtype=features.dtype)
        sot_logits, caches = _prefill_jit(
            model, caches, cross_kv, tokens0[:, :bucket],
            jnp.asarray(n_init, jnp.int32), sot_index,
        )
        ns_prob = jax.nn.softmax(sot_logits, axis=-1)[:, no_speech]
        toks, t_end, sum_lp = greedy_decode_loop(
            model, caches, cross_kv, tokens0,
            jnp.asarray(n_init, jnp.int32), jnp.asarray(n_init, jnp.int32),
            jax.random.PRNGKey(0), suppress_mask, blank_mask,
            sample_len=sample_len, temperature=0.0, params=cfg,
        )
        return toks, t_end, sum_lp, ns_prob

    return fn, {"sample_begin": n_init, "eot": int(tokenizer.eot),
                "sample_len": sample_len}


def export_whisper_greedy(model, out_path, batch: int = 1,
                          language: str = "en", task: str = "transcribe",
                          sample_len: int = 224,
                          platforms: Sequence[str] = ("tpu", "cpu")) -> dict:
    """Export one greedy Whisper window-decode program (30 s window,
    weights baked, language/task fixed)."""
    import json

    tokenizer = model._tokenizer(language, task)
    fn, finalize = whisper_greedy_fn(model, tokenizer, sample_len=sample_len)
    n_frames = 2 * model.dims.n_audio_ctx
    example = (jnp.zeros((batch, n_frames, model.dims.n_mels), jnp.float32),)
    n = export_program(fn, example, out_path, platforms)
    meta = {
        "batch": batch, "language": language, "task": task,
        "n_frames": n_frames, "n_mels": model.dims.n_mels,
        "finalize": finalize,
    }
    with open(f"{out_path}.meta.json", "w") as f:
        json.dump(meta, f, indent=1)
    return {"bytes": n, **meta}


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(
        description="Export an on-device inference artifact (StableHLO "
                    "via jax.export; weights baked in)")
    ap.add_argument("--model", required=True,
                    help="model dir / repo (kokoro) or codec dir (mimi)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--kind", default="kokoro",
                    choices=["kokoro", "mimi", "mimi-stream", "csm",
                             "orpheus", "whisper"])
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--phoneme-bucket", type=int, default=512)
    ap.add_argument("--frame-bucket", type=int, default=1300)
    ap.add_argument("--frames", type=int, default=63,
                    help="mimi: codes length of the exported program")
    ap.add_argument("--chunk-frames", type=int, default=32,
                    help="mimi-stream: frames per stateful decode chunk")
    ap.add_argument("--language", default="en", help="whisper export")
    ap.add_argument("--platforms", default="tpu,cpu")
    args = ap.parse_args(argv)

    platforms = tuple(p.strip() for p in args.platforms.split(",") if p)
    if args.kind == "kokoro":
        from mlx_audio_tpu.utils.loader import load_model

        model = load_model(args.model, domain="tts")
        inner = getattr(model, "model", model)
        n = export_kokoro(inner, args.out, batch=args.batch,
                          phoneme_bucket=args.phoneme_bucket,
                          frame_bucket=args.frame_bucket,
                          platforms=platforms)
    elif args.kind == "csm":
        from mlx_audio_tpu.utils.loader import load_model

        model = load_model(args.model, domain="tts")
        info = export_csm_session(model.model, args.out, batch=args.batch,
                                  platforms=platforms)
        print(f"wrote {args.out}.prefill/.chunk/.meta.json "
              f"({(info['prefill_bytes']+info['chunk_bytes'])/1e6:.1f} MB, "
              f"platforms={platforms})")
        return
    elif args.kind == "orpheus":
        from mlx_audio_tpu.utils.loader import load_model

        model = load_model(args.model, domain="tts")
        info = export_orpheus(model, args.out, batch=args.batch,
                              platforms=platforms)
        print(f"wrote {args.out}.prefill/.chunk/.snac/.meta.json "
              f"({(info['prefill_bytes']+info['chunk_bytes']+info['snac_bytes'])/1e6:.1f} MB)")
        return
    elif args.kind == "whisper":
        from mlx_audio_tpu.models.stt.whisper import Model as WhisperM

        model = WhisperM.from_pretrained(args.model)
        info = export_whisper_greedy(model, args.out, batch=args.batch,
                                     language=args.language,
                                     platforms=platforms)
        print(f"wrote {args.out} ({info['bytes']/1e6:.1f} MB, "
              f"language={args.language})")
        return
    elif args.kind == "mimi-stream":
        from mlx_audio_tpu.codec.mimi.mimi import Mimi

        mimi = Mimi.from_pretrained(args.model)
        info = export_mimi_stream_decode(
            mimi, args.out, batch=args.batch,
            chunk_frames=args.chunk_frames, platforms=platforms)
        print(f"wrote {args.out} (+.meta.json, {info['bytes']/1e6:.1f} MB, "
              f"chunk={args.chunk_frames} frames)")
        return
    else:
        from mlx_audio_tpu.codec.mimi.mimi import Mimi

        mimi = Mimi.from_pretrained(args.model)
        n = export_mimi_decode(mimi, args.out, batch=args.batch,
                               frames=args.frames, platforms=platforms)
    print(f"wrote {args.out} ({n/1e6:.1f} MB, platforms={platforms})")


if __name__ == "__main__":
    main()
