#!/usr/bin/env python
"""Generic causal-LM decode benchmark at Qwen2-0.5B dims (the Spark-TTS
backbone class; random weights).

Measures the shared `generate_tokens_batch` loop (models/lm/causal.py) that
Orpheus/OuteTTS/Spark ride: left-padded prefill + scanned decode chunks
with on-device top-k/top-p sampling.  Spark emits 50 semantic tokens per
audio-second, so realtime factor = tokens-per-second / 50.

Usage: python scripts/bench_causal_lm.py [--dtype bf16|f32] [--batch 1]
       [--tokens 500] [--prompt 64] [--iters 3]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--tokens", type=int, default=500)
    ap.add_argument("--prompt", type=int, default=64)
    ap.add_argument("--json", action="store_true",
                    help="print one final JSON result line (bench_all)")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax.numpy as jnp

    from mlx_audio_tpu.models.lm.causal import (
        LlamaForCausalLM,
        generate_tokens_batch,
    )
    from mlx_audio_tpu.models.lm.llama import LlamaConfig

    # Qwen2-0.5B dims with Spark's extended vocab (~166k)
    cfg = LlamaConfig(
        num_hidden_layers=24, num_attention_heads=14, num_key_value_heads=2,
        head_dim=64, hidden_size=896, intermediate_size=4864,
        rms_norm_eps=1e-6, vocab_size=166_000, max_position_embeddings=32768,
        rope_theta=1_000_000, tie_word_embeddings=True, qkv_bias=True,
    )
    lm = LlamaForCausalLM(cfg)
    if args.dtype == "bf16":
        lm = lm.astype(jnp.bfloat16)
    print(f"params: {lm.num_params()/1e6:.0f}M  dtype={args.dtype}  "
          f"batch={args.batch}")

    rng = np.random.default_rng(0)
    prompts = [rng.integers(5, 150_000, size=args.prompt)
               for _ in range(args.batch)]

    def run(seed):
        return generate_tokens_batch(
            lm, prompts, max_tokens=args.tokens, temperature=0.8, top_k=50,
            stop_tokens=(), seed=seed,
        )

    for s in (10_001, 10_002):
        t0 = time.perf_counter()
        outs = run(s)
        print(f"warmup {s}: {time.perf_counter()-t0:.1f}s "
              f"({sum(len(o) for o in outs)} tokens)")

    times = []
    for s in range(args.iters):
        t0 = time.perf_counter()
        outs = run(s)
        dt = time.perf_counter() - t0
        n = sum(len(o) for o in outs)
        times.append((dt, n))
        print(f"iter {s}: {dt:.3f}s  {n/dt:.0f} tok/s  "
              f"(~{n/dt/50:.1f}x realtime at Spark's 50 tok/audio-sec)")

    dt, n = sorted(times)[len(times) // 2]
    print(f"median: {n/dt:.0f} tok/s => ~{n/dt/50:.1f}x realtime "
          f"(batch {args.batch})")
    if args.json:
        import json
        print(json.dumps({"metric": "causal_lm_tok_per_s",
                          "value": round(n / dt, 0), "unit": "tok/s",
                          "batch": args.batch}))


if __name__ == "__main__":
    main()
