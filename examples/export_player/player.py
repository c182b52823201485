#!/usr/bin/env python
"""Minimal on-device player for exported StableHLO artifacts.

The Swift port's analogue is a working app (reference
mlx_audio_swift/tts, SURVEY layer 8); this is the TPU build's
equivalent demo: the `play` path loads a `.kokoro`-exported program with
ONLY jax + numpy — no mlx_audio_tpu import, no model code, no
checkpoint — runs phonemes -> waveform on whatever backend is present
(TPU or CPU), and writes a .wav with the stdlib.

Two subcommands:

  make-demo  — build a random-weight Kokoro (real 82M dims by default,
               --tiny for a seconds-fast artifact), export it plus a
               demo voice vector (uses mlx_audio_tpu; run once).
  play       — load the artifact and synthesize (no mlx_audio_tpu).

Example:
  python examples/export_player/player.py make-demo --tiny /tmp/demo
  python examples/export_player/player.py play /tmp/demo \
      --out /tmp/demo.wav
"""

from __future__ import annotations

import argparse
import json
import sys
import wave
from pathlib import Path

import numpy as np


def cmd_make_demo(args):
    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
    import jax.numpy as jnp  # noqa: F401

    from mlx_audio_tpu.export import export_kokoro
    from mlx_audio_tpu.models.tts.kokoro.model import Model
    from mlx_audio_tpu.models.tts.kokoro.presets import kokoro_82m_config

    cfg = kokoro_82m_config()
    if args.tiny:
        import dataclasses

        plbert = dict(cfg.plbert)
        plbert.update(hidden_size=64, num_attention_heads=2,
                      intermediate_size=128, num_hidden_layers=1)
        cfg = dataclasses.replace(
            cfg, hidden_dim=64, n_layer=1, style_dim=128, max_dur=50,
            max_conv_dim=128, plbert=plbert,
            istftnet={**cfg.istftnet, "upsample_initial_channel": 64},
        )
    model = Model(cfg)
    prefix = Path(args.prefix)
    prefix.parent.mkdir(parents=True, exist_ok=True)
    phoneme_bucket, frame_bucket = args.phoneme_bucket, args.frame_bucket
    n = export_kokoro(model, str(prefix) + ".kokoro", batch=1,
                      phoneme_bucket=phoneme_bucket,
                      frame_bucket=frame_bucket, platforms=("tpu", "cpu"))
    rng = np.random.default_rng(0)
    np.save(str(prefix) + ".voice.npy",
            (rng.standard_normal(256) * 0.1).astype(np.float32))
    meta = {
        "phoneme_bucket": phoneme_bucket,
        "frame_bucket": frame_bucket,
        "n_token": int(model.config.n_token),
        "sample_rate": 24_000,
        "samples_per_frame": 600,
    }
    (prefix.parent / (prefix.name + ".meta.json")).write_text(
        json.dumps(meta, indent=1))
    print(f"wrote {prefix}.kokoro ({n/1e6:.1f} MB), .voice.npy, .meta.json")


def cmd_play(args):
    """Everything below needs ONLY jax + numpy + stdlib."""
    import time

    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    prefix = Path(args.prefix)
    meta = json.loads((prefix.parent
                       / (prefix.name + ".meta.json")).read_text())
    program = jexport.deserialize(
        (prefix.parent / (prefix.name + ".kokoro")).read_bytes()).call

    bucket = meta["phoneme_bucket"]
    if args.phonemes:
        ids = [int(x) for x in args.phonemes.split(",")]
    else:  # demo input: a plausible random phoneme sequence
        rng = np.random.default_rng(args.seed)
        ids = rng.integers(1, meta["n_token"], size=48).tolist()
    n = min(len(ids), bucket)
    input_ids = np.zeros((1, bucket), np.int32)
    input_ids[0, :n] = ids[:n]
    lengths = np.asarray([n], np.int32)
    ref_s = np.load(prefix.parent / (prefix.name + ".voice.npy"))
    speeds = np.asarray([args.speed], np.float32)
    key = jax.random.PRNGKey(args.seed)

    t0 = time.perf_counter()
    audio, pred_dur = program(
        jnp.asarray(input_ids), jnp.asarray(lengths),
        jnp.asarray(ref_s, jnp.float32)[None], jnp.asarray(speeds), key)
    audio = np.asarray(audio)[0]
    wall = time.perf_counter() - t0
    frames = int(np.asarray(pred_dur)[0, :n].sum())
    samples = min(frames * meta["samples_per_frame"], audio.shape[-1])
    audio = audio[:samples]
    sr = meta["sample_rate"]
    print(f"{samples/sr:.2f}s of audio in {wall:.2f}s "
          f"(rtf {samples/sr/max(wall, 1e-9):.1f}x, "
          f"backend={jax.default_backend()})")

    pcm = (np.clip(audio, -1, 1) * 32767).astype(np.int16)
    with wave.open(args.out, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    print(f"wrote {args.out}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    mk = sub.add_parser("make-demo")
    mk.add_argument("prefix")
    mk.add_argument("--tiny", action="store_true",
                    help="tiny random dims (fast artifact for smoke tests)")
    mk.add_argument("--phoneme-bucket", type=int, default=64)
    mk.add_argument("--frame-bucket", type=int, default=200)
    mk.set_defaults(fn=cmd_make_demo)

    pl = sub.add_parser("play")
    pl.add_argument("prefix")
    pl.add_argument("--out", default="out.wav")
    pl.add_argument("--phonemes", default="",
                    help="comma-separated phoneme ids (default: random demo)")
    pl.add_argument("--speed", type=float, default=1.0)
    pl.add_argument("--seed", type=int, default=0)
    pl.set_defaults(fn=cmd_play)

    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
