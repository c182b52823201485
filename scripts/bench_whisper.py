#!/usr/bin/env python
"""Whisper large-v3-turbo single-chip decode benchmark (random weights).

Measures batched 30 s-window transcription throughput through the public
`api.decode` path (encoder + greedy/beam jitted decode loops + logit
filters).  Random weights never emit EOT, so every window decodes the full
``--sample-len`` token budget — a conservative lower bound; real audio
stops at EOT much earlier.

Metric: audio-seconds transcribed per wall-second (30 s per window).

Usage: python scripts/bench_whisper.py [--dtype bf16|f32] [--batch 8]
       [--sample-len 224] [--beam 0] [--iters 5]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import time

import numpy as np


def real_dims(n_vocab: int):
    """large-v3-turbo dimensions (HF openai/whisper-large-v3-turbo)."""
    from mlx_audio_tpu.models.stt.whisper.model import ModelDimensions

    return ModelDimensions(
        n_mels=128, n_audio_ctx=1500, n_audio_state=1280, n_audio_head=20,
        n_audio_layer=32, n_vocab=n_vocab, n_text_ctx=448, n_text_state=1280,
        n_text_head=20, n_text_layer=4,
    )


def synthetic_tokenizer():
    """Full-size multilingual tokenizer over a synthetic byte-level BPE
    (vocab files are runtime data we don't ship; ids→bytes is all the
    decode path needs)."""
    import tiktoken

    from mlx_audio_tpu.models.stt.whisper.tokenizer import (
        Tokenizer,
        whisper_special_tokens,
    )

    n_base = 50_257  # gpt2-sized base vocab, as in multilingual whisper
    # single bytes get ids 0..255 so encode(" -") etc. works; the rest are
    # filler multi-byte keys (never produced, only needed for id→bytes)
    ranks = {bytes([i]): i for i in range(256)}
    for i in range(256, n_base):
        ranks[b"\x00" + i.to_bytes(3, "big")] = i
    specials = {}
    n_vocab = n_base
    for token in whisper_special_tokens(num_languages=100):
        specials[token] = n_vocab
        n_vocab += 1
    enc = tiktoken.Encoding(
        name="bench", explicit_n_vocab=n_vocab,
        pat_str=r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""",
        mergeable_ranks=ranks, special_tokens=specials,
    )
    return Tokenizer(encoding=enc, num_languages=100, language="en",
                     task="transcribe"), n_vocab


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--sample-len", type=int, default=224)
    ap.add_argument("--beam", type=int, default=0, help="0 = greedy")
    ap.add_argument("--json", action="store_true",
                    help="print one final JSON result line (bench_all)")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--without-timestamps", action="store_true",
                    help="disable timestamp rules (they gate EOT, so the "
                         "--eot-bias finish-length profile is rule-bound "
                         "with them on)")
    ap.add_argument("--eot-bias", type=float, default=0.0,
                    help="additive EOT logit bias: random weights never "
                         "emit EOT, so the default bench decodes the full "
                         "budget (worst case); a bias of ~4-6 makes rows "
                         "finish at realistic staggered lengths, "
                         "exercising early-stop (greedy) and finished-"
                         "audio compaction (beam)")
    ap.add_argument("--stagger", default=None, metavar="MIN:MAX",
                    help="scripted per-audio finish lengths spread linearly "
                         "MIN..MAX across the batch (DecodingOptions."
                         "eot_cutoff) — unlike --eot-bias, rows finish at "
                         "DIFFERENT steps, so beam retirement/compaction "
                         "actually fires (VERDICT r4 #7)")
    ap.add_argument("--no-compact", action="store_true",
                    help="disable finished-audio compaction (control arm "
                         "for the retirement bench)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mlx_audio_tpu.models.stt.whisper import api
    from mlx_audio_tpu.models.stt.whisper.decoding import DecodingOptions
    from mlx_audio_tpu.models.stt.whisper.model import WhisperModel

    tokenizer, n_vocab = synthetic_tokenizer()
    model = WhisperModel(real_dims(n_vocab))
    if args.dtype == "bf16":
        model = model.astype(jnp.bfloat16)
    print(f"params: {model.num_params()/1e6:.0f}M  dtype={args.dtype}  "
          f"batch={args.batch}  sample_len={args.sample_len}  "
          f"beam={args.beam or 'greedy'}")

    rng = np.random.default_rng(0)
    mel = jnp.asarray(
        rng.standard_normal((args.batch, 3000, 128)) * 0.1, dtype=jnp.float32
    )

    cutoff = None
    if args.stagger:
        lo, hi = (int(x) for x in args.stagger.split(":"))
        cutoff = np.linspace(lo, hi, args.batch).round().astype(int).tolist()
        print(f"stagger: per-audio finish lengths {cutoff}")
    options = DecodingOptions(
        language="en", sample_len=args.sample_len,
        beam_size=args.beam or None,
        without_timestamps=args.without_timestamps,
        logit_bias=({tokenizer.eot: args.eot_bias} if args.eot_bias else
                    None),
        eot_cutoff=cutoff,
        beam_compact=not args.no_compact,
    )

    def run():
        res = api.decode(model, mel, options, tokenizer=tokenizer)
        # drain: decode returns host-side results (token lists), already synced
        return res

    for i in range(2):
        t0 = time.perf_counter()
        run()
        print(f"warmup {i}: {time.perf_counter()-t0:.1f}s")

    audio_sec = args.batch * 30.0
    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        res = run()
        dt = time.perf_counter() - t0
        times.append(dt)
        lens = [len(r.tokens) for r in (res if isinstance(res, list)
                                        else [res])]
        print(f"iter {i}: {dt:.3f}s  {audio_sec/dt:.1f} audio-sec/s  "
              f"(len mean {np.mean(lens):.0f} max {max(lens)})")

    med = sorted(times)[len(times) // 2]
    tok_s = args.batch * args.sample_len / med
    print(f"median: {med:.3f}s for {audio_sec:.0f} transcribed audio-sec "
          f"=> {audio_sec/med:.1f} audio-sec/s ({tok_s:.0f} tok/s decode)")
    if args.json:
        import json
        print(json.dumps({"metric": "whisper_audio_sec_per_s",
                          "value": round(audio_sec / med, 1),
                          "unit": "audio-sec/s", "batch": args.batch,
                          "beam": args.beam or 0}))


if __name__ == "__main__":
    main()
