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
        "cache_shapes": [list(x.shape) for x in flat],
        "cache_dtypes": [str(x.dtype) for x in flat],
        "eos": "all-zero frame",
        "frame_ms": 80,
    }
    with open(f"{out_prefix}.meta.json", "w") as f:
        json.dump(meta, f, indent=1)
    return {"prefill_bytes": n1, "chunk_bytes": n2, **meta}


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
                    choices=["kokoro", "mimi", "csm"])
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--phoneme-bucket", type=int, default=512)
    ap.add_argument("--frame-bucket", type=int, default=1300)
    ap.add_argument("--frames", type=int, default=63,
                    help="mimi: codes length of the exported program")
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
    else:
        from mlx_audio_tpu.codec.mimi.mimi import Mimi

        mimi = Mimi.from_pretrained(args.model)
        n = export_mimi_decode(mimi, args.out, batch=args.batch,
                               frames=args.frames, platforms=platforms)
    print(f"wrote {args.out} ({n/1e6:.1f} MB, platforms={platforms})")


if __name__ == "__main__":
    main()
