#!/usr/bin/env python
"""Spark-TTS-0.5B end-to-end benchmark, real dimensions, random weights.

Full pipeline through the public `Model.generate_batch` (control mode):
Qwen2-0.5B LM decode (jitted batched scan via generate_tokens_batch,
166k vocab, repetition penalty + top-k/top-p) -> token parse -> BiCodec
detokenize (8192-entry VQ -> 12-layer Vocos prenet -> 320x WaveGenerator)
at Spark-TTS BiCodec dims.  Random weights never emit EOS, so rows run
the full `max_tokens` budget; each semantic token is 1/50 s of audio.

Reference loop being matched: /root/reference/mlx_audio/tts/models/spark/
spark.py:207-320 (single segment, per-token python loop).

Usage: python scripts/bench_spark.py [--batch 2] [--tokens 400] [--iters 3]
       [--dtype bf16|f32] [--json]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import json
import time

import numpy as np

BICODEC_CFG = {
    # Spark-TTS-0.5B BiCodec config.yaml dims (50 Hz semantic tokens,
    # 320x wave upsample to 16 kHz)
    "mel_params": {
        "sample_rate": 16000, "n_fft": 1024, "win_length": 640,
        "hop_length": 320, "mel_fmin": 10, "mel_fmax": None, "num_mels": 128,
    },
    "encoder": {
        "input_channels": 1024, "vocos_dim": 384,
        "vocos_intermediate_dim": 2048, "vocos_num_layers": 12,
        "out_channels": 1024, "sample_ratios": [1, 1],
    },
    "decoder": {
        "input_channel": 1024, "channels": 1536, "rates": [8, 5, 4, 2],
        "kernel_sizes": [16, 11, 8, 4],
    },
    "quantizer": {"input_dim": 1024, "codebook_size": 8192,
                  "codebook_dim": 8},
    "speaker_encoder": {
        "input_dim": 128, "out_dim": 1024, "latent_dim": 128,
        "token_num": 32, "fsq_levels": [4, 4, 4, 4, 4, 4],
        "fsq_num_quantizers": 1,
    },
    "prenet": {
        "input_channels": 1024, "vocos_dim": 384,
        "vocos_intermediate_dim": 2048, "vocos_num_layers": 12,
        "out_channels": 1024, "condition_dim": 1024, "sample_ratios": [1, 1],
    },
    "postnet": {
        "input_channels": 1024, "vocos_dim": 384,
        "vocos_intermediate_dim": 2048, "vocos_num_layers": 6,
        "out_channels": 1024, "sample_ratios": [1, 1],
    },
}


class _FakeTokenizer:
    """Qwen tokenizer stand-in: every generated id becomes one BiCodec
    token string — the first 32 map to global tokens, the rest to
    semantic tokens, mirroring control-mode output structure."""

    def __call__(self, text, return_tensors=None):
        ids = np.asarray([[(hash(c) % 1000) + 10 for c in text[:64]]],
                         dtype=np.int32)

        class R:
            input_ids = ids

        return R()

    def decode(self, ids, skip_special_tokens=False):
        glo = "".join(f"<|bicodec_global_{i % 4096}|>" for i in ids[:32])
        sem = "".join(f"<|bicodec_semantic_{i % 8192}|>" for i in ids[32:])
        return glo + sem


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--tokens", type=int, default=432,
                    help="LM budget (432 = 32 global + 400 semantic = 8 s)")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp

    from mlx_audio_tpu.models.tts.spark.bicodec import BiCodec
    from mlx_audio_tpu.models.tts.spark.spark import Model, ModelConfig

    model = Model(ModelConfig(), bicodec=BiCodec(BICODEC_CFG),
                  tokenizer=_FakeTokenizer())
    if args.dtype == "bf16":
        model = model.astype(jnp.bfloat16)
    print(f"params: {model.num_params()/1e6:.0f}M  dtype={args.dtype}  "
          f"batch={args.batch} tokens={args.tokens}")

    texts = [f"benchmark sentence number {i} for the spark pipeline"
             for i in range(args.batch)]

    def run():
        results = model.generate_batch(
            texts, gender="female", temperature=0.8, top_k=50, top_p=0.95,
            max_tokens=args.tokens, seed=0)
        return sum(r.audio.size / 16000.0 for r in results)

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
            "metric": "spark_audio_sec_per_s", "value": round(sec / med, 2),
            "unit": "audio-sec/s", "dtype": args.dtype, "batch": args.batch,
            "tokens": args.tokens,
        }))


if __name__ == "__main__":
    main()
