#!/usr/bin/env python
"""IndexTTS benchmark at IndexTTS-1.5-class dimensions, random weights.

Full pipeline through the public `Model.generate_batch`: conformer+
perceiver conditioning on a reference mel -> 1280x24L GPT-2 mel-code AR
decode (jitted scan chunks) -> speaker-conditioned BigVGAN synthesis
(1024x upsample).  Random weights essentially never sample the stop
code (1/8194 per step), so rows run the full `max_tokens` budget —
a fixed-budget lower bound.  One mel token = 1024 samples @ 24 kHz.

Reference loop being matched: /root/reference/mlx_audio/tts/models/
indextts/indextts.py:352-413 (single text, per-token python loop).

Usage: python scripts/bench_indextts.py [--batch 2] [--tokens 192]
       [--iters 3] [--dtype bf16|f32] [--json]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import json
import time

import numpy as np


class _FakeSpm:
    def encode(self, text):
        return [(hash(c) % 11000) + 2 for c in text.split()]


def indextts_cfg():
    from mlx_audio_tpu.models.tts.indextts.conformer import ConformerArgs
    from mlx_audio_tpu.models.tts.indextts.indextts import (
        GPTConfig,
        ModelConfig,
    )
    from mlx_audio_tpu.models.tts.indextts.vocoder import (
        BigVGANConditioningConfig,
    )

    conformer = ConformerArgs(
        input_size=100, output_size=512, num_blocks=6, linear_units=2048,
        attention_heads=8, input_layer="conv2d2", cnn_module_kernel=15,
        pos_emb_max_len=5000, perceiver_mult=4,
    )
    return ModelConfig(
        bigvgan=BigVGANConditioningConfig(
            num_mels=100, upsample_rates=[8, 8, 4, 2, 2],
            upsample_kernel_sizes=[16, 16, 8, 4, 4],
            upsample_initial_channel=1536, resblock="1",
            resblock_kernel_sizes=[3, 7, 11],
            resblock_dilation_sizes=[[1, 3, 5]] * 3,
            activation="snakebeta", snake_logscale=True,
            use_tanh_at_final=False, gpt_dim=1280,
            speaker_embedding_dim=512,
        ),
        gpt=GPTConfig(
            model_dim=1280, heads=20, layers=24, max_mel_tokens=605,
            max_text_tokens=402, number_text_tokens=12000,
            number_mel_codes=8194, start_mel_token=8192, stop_mel_token=8193,
            start_text_token=0, stop_text_token=1,
            condition_module=conformer, condition_num_latent=32,
        ),
        sample_rate=24000,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--tokens", type=int, default=192,
                    help="mel-code budget (192 ~= 8.2 s of audio)")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp

    from mlx_audio_tpu.models.tts.indextts.indextts import Model

    model = Model(indextts_cfg(), tokenizer=_FakeSpm())
    if args.dtype == "bf16":
        model = model.astype(jnp.bfloat16)
    print(f"params: {model.num_params()/1e6:.0f}M  dtype={args.dtype}  "
          f"batch={args.batch} tokens={args.tokens}")

    rng = np.random.default_rng(0)
    ref_mel = jnp.asarray(rng.standard_normal((1, 312, 100)) * 0.3,
                          dtype=jnp.float32)  # ~3.3 s reference
    texts = [f"benchmark sentence number {i} for the index tts pipeline"
             for i in range(args.batch)]

    def run():
        results = model.generate_batch(
            texts, ref_mel=ref_mel, max_tokens=args.tokens, temperature=0.8,
            top_k=30, seed=0)
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
    print(f"median: {med:.3f}s => {sec/med:.2f} audio-sec/s")
    if args.json:
        print(json.dumps({
            "metric": "indextts_audio_sec_per_s",
            "value": round(sec / med, 2), "unit": "audio-sec/s",
            "dtype": args.dtype, "batch": args.batch, "tokens": args.tokens,
        }))


if __name__ == "__main__":
    main()
