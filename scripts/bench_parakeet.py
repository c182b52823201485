#!/usr/bin/env python
"""Parakeet-TDT-0.6B-class STT benchmark (real encoder dimensions, random
weights): chunked long-audio transcription through the public
`BaseParakeet.generate` (conformer encoder + TDT label loop + token merge).

Usage: python scripts/bench_parakeet.py [--secs 120] [--iters 5] [--json]
       [--dtype bf16|f32]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import json
import time

import numpy as np

VOCAB = [f"<tok{i}>" for i in range(1024)]


def tdt06b_config() -> dict:
    """nvidia/parakeet-tdt-0.6b-v2 encoder dims (24x1024 conformer,
    8x subsampling) with a synthetic vocabulary."""
    return {
        "target": "nemo.collections.asr.models.rnnt_bpe_models.EncDecRNNTBPEModel",
        "model_defaults": {"tdt_durations": [0, 1, 2, 3, 4]},
        "preprocessor": {
            "sample_rate": 16000, "normalize": "per_feature",
            "window_size": 0.025, "window_stride": 0.01, "window": "hann",
            "features": 128, "n_fft": 512, "dither": 0.0,
        },
        "encoder": {
            "feat_in": 128, "n_layers": 24, "d_model": 1024, "n_heads": 8,
            "ff_expansion_factor": 4, "subsampling_factor": 8,
            "self_attention_model": "rel_pos", "subsampling": "dw_striding",
            "conv_kernel_size": 9, "subsampling_conv_channels": 256,
            "pos_emb_max_len": 5000,
        },
        "decoder": {
            "blank_as_pad": True, "vocab_size": len(VOCAB),
            "prednet": {"pred_hidden": 640, "pred_rnn_layers": 2},
        },
        "joint": {
            "num_classes": len(VOCAB),
            "vocabulary": VOCAB,
            "jointnet": {"joint_hidden": 640, "activation": "relu",
                         "encoder_hidden": 1024, "pred_hidden": 640},
            "num_extra_outputs": 5,
        },
        "decoding": {"model_type": "tdt", "durations": [0, 1, 2, 3, 4],
                     "greedy": None},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=float, default=120.0)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--chunk", type=float, default=30.0)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp

    from mlx_audio_tpu.models.stt.parakeet.parakeet import BaseParakeet

    model = BaseParakeet.from_config(tdt06b_config())
    if args.dtype == "bf16":
        model = model.astype(jnp.bfloat16)
    print(f"params: {model.num_params()/1e6:.0f}M  dtype={args.dtype}  "
          f"audio={args.secs:.0f}s chunks={args.chunk:.0f}s")

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(int(args.secs * 16000)) * 0.05
             ).astype(np.float32)

    def run():
        return model.generate(audio, chunk_duration=args.chunk,
                              overlap_duration=5.0)

    for i in range(2):
        t0 = time.perf_counter()
        out = run()
        print(f"warmup {i}: {time.perf_counter()-t0:.1f}s "
              f"({len(out.text)} chars)")

    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        out = run()
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"iter {i}: {dt:.3f}s  {args.secs/dt:.0f} audio-sec/s")
    med = sorted(times)[len(times) // 2]
    print(f"median: {med:.3f}s => {args.secs/med:.1f} audio-sec/s")
    if args.json:
        print(json.dumps({
            "metric": "parakeet_audio_sec_per_s",
            "value": round(args.secs / med, 1), "unit": "audio-sec/s",
            "dtype": args.dtype, "secs": args.secs,
        }))


if __name__ == "__main__":
    main()
