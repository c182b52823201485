#!/usr/bin/env python
"""Dia-1.6B benchmark, real dimensions, random weights.

Full pipeline through the public `Model.generate_batch`: byte-level text
encoder (12x1024) -> CFG decode loop (18x2048 decoder, 2 forwards per
step: uncond+cond rows interleaved) over 9 delayed DAC channels ->
DAC-44 kHz decode.  Random weights never sample EOS (class 1024 of
1028), so every row runs the full `max_tokens` budget — a fixed-budget
lower bound.  Audio seconds = frames / 86.13 (DAC 44.1 kHz, 512x hop).

Reference loop being matched: /root/reference/mlx_audio/tts/models/dia/
dia.py:230-420 (single text, python-loop decode).

Usage: python scripts/bench_dia.py [--batch 2] [--tokens 344] [--iters 3]
       [--dtype bf16|f32] [--json]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import json
import time

FRAME_RATE = 44100 / 512  # 86.13 DAC frames / audio-second


def dac_44k_cfg():
    """descript/dac_44khz dims (EncoderDecoder 512x hop, 9 codebooks)."""
    from mlx_audio_tpu.codec.dac import DACConfig

    return DACConfig(
        encoder_dim=64, encoder_rates=[2, 4, 8, 8], decoder_dim=1536,
        decoder_rates=[8, 8, 4, 2], n_codebooks=9, codebook_size=1024,
        codebook_dim=8, sample_rate=44100,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--tokens", type=int, default=344,
                    help="decode frames (344 ~= 4 s of audio)")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp

    from mlx_audio_tpu.codec.dac import DAC
    from mlx_audio_tpu.models.tts.dia.config import DiaConfig
    from mlx_audio_tpu.models.tts.dia.model import Model

    cfg = DiaConfig()  # defaults ARE nari-labs/Dia-1.6B dims
    model = Model(cfg, dac_model=DAC(dac_44k_cfg()))
    if args.dtype == "bf16":
        model = model.astype(jnp.bfloat16)
    print(f"params: {model.num_params()/1e6:.0f}M  dtype={args.dtype}  "
          f"batch={args.batch} tokens={args.tokens}")

    texts = [f"[S1] benchmark sentence {i}. [S2] a reply for row {i}."
             for i in range(args.batch)]

    def run():
        results = model.generate_batch(
            texts, max_tokens=args.tokens, temperature=1.3, seed=0)
        return sum(r.audio.size / 44100.0 for r in results)

    for i in range(2):
        t0 = time.perf_counter()
        sec = run()
        print(f"warmup {i}: {time.perf_counter()-t0:.1f}s ({sec:.1f} audio-s)")

    times, secs = [], []
    for i in range(args.iters):
        t0 = time.perf_counter()
        sec = run()
        dt = time.perf_counter() - t0
        times.append(dt)
        secs.append(sec)
        print(f"iter {i}: {dt:.3f}s  {sec/dt:.2f} audio-sec/s")
    med_i = sorted(range(len(times)), key=lambda j: times[j])[len(times) // 2]
    med, sec = times[med_i], secs[med_i]
    print(f"median: {med:.3f}s => {sec/med:.2f} audio-sec/s")
    if args.json:
        print(json.dumps({
            "metric": "dia_audio_sec_per_s", "value": round(sec / med, 2),
            "unit": "audio-sec/s", "dtype": args.dtype, "batch": args.batch,
            "tokens": args.tokens,
        }))


if __name__ == "__main__":
    main()
