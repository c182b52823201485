#!/usr/bin/env python
"""Bark benchmark at suno/bark (large) dimensions, random weights.

Full three-stage pipeline through the public `Model.generate_batch`
(semantic GPT AR loop -> coarse sliding-window AR loop -> fine
non-causal fills -> EnCodec decode).  Random weights essentially never
sample the semantic early-stop class (1/10001 per step), so every row
runs the full `max_steps` semantic budget — audio seconds are
max_steps/49.9 per row and the numbers are a fixed-budget lower bound
(real prompts stop early).

Reference loop being matched: /root/reference/mlx_audio/tts/models/bark/
pipeline.py:122-442 (single text only; batch is net-new capability).

Usage: python scripts/bench_bark.py [--batch 4] [--steps 384] [--iters 3]
       [--dtype bf16|f32] [--json]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import json
import time

import numpy as np

from mlx_audio_tpu.models.tts.bark.bark import SEMANTIC_RATE_HZ


class _FakeTokenizer:
    """BertTokenizer stand-in: stable per-word ids (perf only)."""

    def encode(self, text, add_special_tokens=False):
        return [(hash(w) % 9000) + 100 for w in text.split()]


def bark_large_cfg() -> dict:
    """suno/bark (large) stage dims: 24-layer / 16-head / 1024-wide GPT per
    stage (HF suno/bark config.json hidden_size=1024, num_layers=24,
    num_heads=16) over the 24 kHz EnCodec."""
    stage = dict(block_size=1024, n_layer=24, n_head=16, n_embd=1024,
                 bias=False)
    return dict(
        semantic_config=dict(input_vocab_size=129600,
                             output_vocab_size=129600, **stage),
        coarse_acoustics_config=dict(input_vocab_size=12096,
                                     output_vocab_size=12096, **stage),
        fine_acoustics_config=dict(input_vocab_size=1056,
                                   output_vocab_size=1056, n_codes_total=8,
                                   n_codes_given=1, **stage),
    )


def encodec_24k_cfg() -> dict:
    """facebook/encodec_24khz dims."""
    return dict(
        audio_channels=1, num_filters=32, hidden_size=128, codebook_size=1024,
        codebook_dim=128, num_residual_layers=1, dilation_growth_rate=2,
        num_lstm_layers=2, kernel_size=7, last_kernel_size=7,
        residual_kernel_size=3, use_causal_conv=True, normalize=False,
        pad_mode="reflect", norm_type="weight_norm", trim_right_ratio=1.0,
        compress=2, upsampling_ratios=[8, 5, 4, 2],
        target_bandwidths=[1.5, 3.0, 6.0, 12.0, 24.0], sampling_rate=24000,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=384,
                    help="semantic step budget (768 = bark's full 15.4 s)")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp

    from mlx_audio_tpu.codec.encodec import Encodec, EncodecConfig
    from mlx_audio_tpu.models.tts.bark.bark import Model, ModelConfig

    codec = Encodec(EncodecConfig.from_dict(encodec_24k_cfg()))
    model = Model(ModelConfig.from_dict(bark_large_cfg()), codec=codec,
                  tokenizer=_FakeTokenizer())
    if args.dtype == "bf16":
        model = model.astype(jnp.bfloat16)
    print(f"params: {model.num_params()/1e6:.0f}M  dtype={args.dtype}  "
          f"batch={args.batch} semantic_steps={args.steps}")

    texts = [f"benchmark sentence number {i} for the bark pipeline"
             for i in range(args.batch)]

    def run():
        results = model.generate_batch(texts, temperature=0.7, seed=0,
                                       max_steps=args.steps)
        return sum(r.audio.size / 24000.0 for r in results)

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
    print(f"median: {med:.3f}s => {sec/med:.2f} audio-sec/s "
          f"(expected audio {args.steps/SEMANTIC_RATE_HZ:.1f}s/row)")
    if args.json:
        print(json.dumps({
            "metric": "bark_audio_sec_per_s", "value": round(sec / med, 2),
            "unit": "audio-sec/s", "dtype": args.dtype, "batch": args.batch,
            "semantic_steps": args.steps,
        }))


if __name__ == "__main__":
    main()
