#!/usr/bin/env python
"""Voxtral-Mini benchmark, real dimensions, random weights.

Long-audio transcription through the public `Model.generate`: mel ->
32x1280 Whisper-style audio tower -> 4-frame grouping + projector ->
token splice -> 30x3072 Llama decode over all 30 s windows as ONE
batched AR loop.  Random weights never emit EOS, so every window runs
the full `max_tokens` budget — a fixed-budget lower bound (real audio
EOTs much earlier).

Reference loop being matched: /root/reference/mlx_audio/stt/models/
voxtral/voxtral.py (per-window serial decode).

Usage: python scripts/bench_voxtral.py [--secs 120] [--max-tokens 128]
       [--iters 3] [--dtype bf16|f32] [--json]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=float, default=120.0)
    ap.add_argument("--max-tokens", type=int, default=128)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--quant", default="none",
                    choices=["none", "int8", "int4"],
                    help="weight-only quantize every Linear/Embedding "
                         "(group 128 so decode hits the fused Pallas "
                         "dequant-matmul; int4 packs 2 codes/byte)")
    ap.add_argument("--probe-secs", default=None, metavar="S1,S2,...",
                    help="capacity probe: run each audio length once, "
                         "report the longest that fits before OOM")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mlx_audio_tpu.models.stt.voxtral.voxtral import Model, ModelConfig

    # ModelConfig defaults ARE mistralai/Voxtral-Mini-3B dims.  Build on
    # the host: 3.6B random-init f32 params (14.6 GB) would OOM the chip
    # before the bf16 cast; the cast copy ships 7.3 GB to HBM instead.
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        model = Model(ModelConfig(), tokenizer=None)
        if args.quant != "none":
            from mlx_audio_tpu.nn.quantize import quantize_model

            bits = 8 if args.quant == "int8" else 4
            quantize_model(model, group_size=128, bits=bits)
        if args.dtype == "bf16":
            model = model.astype(jnp.bfloat16)
    model = jax.device_put(model, jax.devices()[0])
    print(f"params: {model.num_params()/1e6:.0f}M  "
          f"resident: {model.num_bytes()/2**30:.2f} GiB  "
          f"dtype={args.dtype} quant={args.quant}  "
          f"audio={args.secs:.0f}s max_tokens={args.max_tokens}")

    rng = np.random.default_rng(0)

    if args.probe_secs:
        # capacity probe: walk the window batch up until the chip OOMs —
        # the resident-weight savings of int8/int4 buy window batch (one
        # host build, fresh audio per point; docs/PERF.md quant verdict)
        last_ok = None
        for secs in (float(s) for s in args.probe_secs.split(",")):
            audio = (rng.standard_normal(int(secs * 16000)) * 0.05
                     ).astype(np.float32)
            try:
                t0 = time.perf_counter()
                out = model.generate(audio, max_tokens=args.max_tokens,
                                     temperature=0.0)
                n = sum(len(s["tokens"]) for s in out.segments)
                dt = time.perf_counter() - t0
                print(f"probe {secs:.0f}s ({int(secs/30)} windows): OK "
                      f"{dt:.1f}s ({n} tokens)")
                last_ok = secs
            except Exception as e:  # RESOURCE_EXHAUSTED et al.
                print(f"probe {secs:.0f}s ({int(secs/30)} windows): FAIL "
                      f"{type(e).__name__}: {str(e)[:120]}")
                break
        print(json.dumps({
            "metric": "voxtral_max_secs_before_oom", "value": last_ok,
            "unit": "audio-sec", "quant": args.quant, "dtype": args.dtype,
            "resident_gib": round(model.num_bytes() / 2**30, 2),
        }))
        return

    audio = (rng.standard_normal(int(args.secs * 16000)) * 0.05
             ).astype(np.float32)

    def run():
        out = model.generate(audio, max_tokens=args.max_tokens,
                             temperature=0.0)
        return sum(len(s["tokens"]) for s in out.segments)

    for i in range(2):
        t0 = time.perf_counter()
        n = run()
        print(f"warmup {i}: {time.perf_counter()-t0:.1f}s ({n} tokens)")

    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        n = run()
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"iter {i}: {dt:.3f}s  {args.secs/dt:.1f} audio-sec/s "
              f"({n} tokens)")
    med = sorted(times)[len(times) // 2]
    print(f"median: {med:.3f}s => {args.secs/med:.1f} audio-sec/s")
    if args.json:
        print(json.dumps({
            "metric": "voxtral_audio_sec_per_s",
            "value": round(args.secs / med, 1), "unit": "audio-sec/s",
            "dtype": args.dtype, "quant": args.quant,
            "resident_gib": round(model.num_bytes() / 2**30, 2),
            "secs": args.secs, "max_tokens": args.max_tokens,
        }))


if __name__ == "__main__":
    main()
