#!/usr/bin/env python
"""CSM-1B single-chip decode benchmark (real dimensions, random weights).

Measures end-to-end realtime factor of the AR loop: prefill + chunked
frame scans (backbone step + 31 depth-decoder steps per 80 ms frame) +
Mimi decode + watermark.  The reference's equivalent loop is
sesame.py:774-817 (per audio-second: 12.5 backbone + 387 depth steps).

Usage: python scripts/bench_csm.py [--dtype bf16|f32] [--frames 62]
       [--prompt 128] [--iters 5] [--no-watermark]
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
    ap.add_argument("--frames", type=int, default=62)
    ap.add_argument("--prompt", type=int, default=120)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--batch", type=int, default=1,
                    help="decode B utterances at once (serving throughput)")
    ap.add_argument("--quant", type=int, default=0, choices=[0, 4, 8],
                    help="weight-only quantize the LMs to N bits "
                         "(Pallas fused dequant-matmul decode)")
    ap.add_argument("--no-watermark", action="store_true")
    ap.add_argument("--spec", action="store_true",
                    help="speculative depth decode: int8 streaming draft "
                         "kernel + bf16 verify (batch 1; exact under "
                         "greedy)")
    ap.add_argument("--temp", type=float, default=0.9,
                    help="sampling temperature (0 = greedy)")
    ap.add_argument("--json", action="store_true",
                    help="print one final JSON result line (bench_all)")
    ap.add_argument("--ttfa", action="store_true",
                    help="measure streaming time-to-first-audio instead of "
                         "bulk throughput (prefill + first streaming chunk "
                         "+ stateful Mimi decode)")
    ap.add_argument("--ttfa-trace", action="store_true",
                    help="per-stage TTFA decomposition (each stage synced "
                         "with a data-dependent fetch): locates the "
                         "bimodal slow mode (VERDICT r3 weak #3)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mlx_audio_tpu.models.tts.sesame.model import (
        Model,
        _frame_chunk,
        _prefill_and_first_frame,
        _prompt_bucket,
    )

    config = {
        "backbone_flavor": "llama-1B",
        "decoder_flavor": "llama-100M",
        "audio_num_codebooks": 32,
        "audio_vocab_size": 2051,
        "text_vocab_size": 128_256,
    }
    model = Model(config)
    if args.quant:
        from mlx_audio_tpu.nn.quantize import quantize_model

        # quantize before the bf16 cast so cast_lm moves scales/biases (and
        # hence dequantized activations) to bf16; codebook0_head O=2051
        # falls back to the dense path
        model.model = quantize_model(model.model, group_size=128,
                                     bits=args.quant)
    if args.dtype == "bf16":
        model.cast_lm(jnp.bfloat16)
    if args.spec:
        model.model.enable_spec_decode()
    n_params = model.model.num_params()
    print(f"params: {n_params/1e9:.2f}B  dtype={args.dtype}  "
          f"quant={args.quant or 'none'}")

    # synthetic prompt: text tokens then audio frames (as voice-match does)
    rng = np.random.default_rng(0)
    t = args.prompt
    nc1 = config["audio_num_codebooks"] + 1
    prompt_tokens = np.zeros((t, nc1), dtype=np.int32)
    prompt_mask = np.zeros((t, nc1), dtype=bool)
    n_text = t // 3
    prompt_tokens[:n_text, -1] = rng.integers(5, 100_000, size=n_text)
    prompt_mask[:n_text, -1] = True
    prompt_tokens[n_text:, :-1] = rng.integers(
        1, config["audio_vocab_size"], size=(t - n_text, nc1 - 1)
    )
    prompt_mask[n_text:, :-1] = True

    max_frames = args.frames
    temp, top_k = args.temp, 50

    b = args.batch

    def run(seed):
        """The body of Model.generate_batch, timed as a unit."""
        key = jax.random.PRNGKey(seed)
        bucket = _prompt_bucket(t)
        pad = bucket - t
        tokens = np.zeros((b, bucket, nc1), dtype=np.int32)
        mask = np.zeros((b, bucket, nc1), dtype=bool)
        tokens[:, pad:] = prompt_tokens
        mask[:, pad:] = prompt_mask
        pad_len = jnp.full((b,), pad, dtype=jnp.int32)
        wdtype = model.model.lm_dtype()
        caches = model.model.backbone.init_cache(
            b, max_len=bucket + max_frames, dtype=wdtype
        )
        key, k0 = jax.random.split(key)
        frame, caches = _prefill_and_first_frame(
            model.model, caches, pad_len, jnp.asarray(tokens),
            jnp.asarray(mask), k0, temp, top_k,
        )
        frames = [np.asarray(frame)]           # list of [B, nc]
        while len(frames) < max_frames:
            n = min(args.chunk, max_frames - len(frames))
            key, kc = jax.random.split(key)
            out, caches = _frame_chunk(
                model.model, caches, pad_len, jnp.asarray(frames[-1]),
                kc, temp, top_k, jnp.zeros((n,), dtype=jnp.int32),
            )
            frames.extend(np.asarray(out))
        codes = jnp.asarray(np.stack(frames, axis=-1))  # [B, nc, T]
        audio = np.asarray(model.mimi.decode(codes))[:, 0]
        if not args.no_watermark:
            audio = np.stack([model._watermark(a) for a in audio])
        return audio[0]

    if args.ttfa_trace:
        n_first = 3
        stages = ["host_prep", "prefill+f0", "chunk2", "mimi", "fetch",
                  "watermark"]

        def run_traced(seed):
            marks = {}

            def mark(name, t0):
                marks[name] = (time.perf_counter() - t0) * 1e3

            t0 = time.perf_counter()
            key = jax.random.PRNGKey(seed)
            bucket = _prompt_bucket(t)
            pad = bucket - t
            tokens = np.zeros((b, bucket, nc1), dtype=np.int32)
            mask = np.zeros((b, bucket, nc1), dtype=bool)
            tokens[:, pad:] = prompt_tokens
            mask[:, pad:] = prompt_mask
            pad_len = jnp.full((b,), pad, dtype=jnp.int32)
            caches = model.model.backbone.init_cache(
                b, max_len=bucket + max_frames, dtype=model.model.lm_dtype()
            )
            key, k0 = jax.random.split(key)
            tokens_j, mask_j = jnp.asarray(tokens), jnp.asarray(mask)
            mark("host_prep", t0)

            t0 = time.perf_counter()
            frame, caches = _prefill_and_first_frame(
                model.model, caches, pad_len, tokens_j, mask_j, k0, temp,
                top_k,
            )
            _ = int(jnp.sum(frame))            # data-dependent drain
            mark("prefill+f0", t0)

            t0 = time.perf_counter()
            key, kc = jax.random.split(key)
            out, caches = _frame_chunk(
                model.model, caches, pad_len, frame, kc, temp, top_k,
                jnp.zeros((n_first - 1,), dtype=jnp.int32),
            )
            _ = int(jnp.sum(out))
            mark("chunk2", t0)

            t0 = time.perf_counter()
            codes = jnp.concatenate(
                [frame[:, :, None], jnp.moveaxis(out, 0, 2)], axis=2
            )
            state = model.mimi.init_state(b)
            audio, _ = model.mimi.decode_frames_stateful(codes, state)
            _ = float(jnp.sum(jnp.abs(audio)))
            mark("mimi", t0)

            t0 = time.perf_counter()
            audio_np = np.asarray(audio)[0, 0]
            mark("fetch", t0)

            t0 = time.perf_counter()
            if not args.no_watermark:
                audio_np = model._watermark(audio_np)
            mark("watermark", t0)
            return marks

        for s in (10_001, 10_002):
            run_traced(s)
        rows = [run_traced(s) for s in range(args.iters)]
        for i, m in enumerate(rows):
            total = sum(m.values())
            print(f"iter {i}: total {total:.0f} ms  " + "  ".join(
                f"{k}={m[k]:.0f}" for k in stages))
        print("\nper-stage p50/p95 (ms):")
        for k in stages:
            v = sorted(m[k] for m in rows)
            p50 = v[len(v) // 2]
            p95 = v[min(len(v) - 1, int(0.95 * len(v)))]
            print(f"  {k:<11} p50 {p50:7.1f}   p95 {p95:7.1f}   "
                  f"min {v[0]:7.1f}   max {v[-1]:7.1f}")
        totals = sorted(sum(m.values()) for m in rows)
        print(f"  {'TOTAL':<11} p50 {totals[len(totals)//2]:7.1f}   "
              f"p95 {totals[min(len(totals)-1, int(0.95*len(totals)))]:7.1f}")
        return

    if args.ttfa:
        # streaming latency: prefill + first frame + the FIRST RAMP chunk
        # (2 frames — the production stream schedule ramps 2,4,chunk,
        # sesame/model.py) + stateful Mimi decode + watermark => the first
        # 3 frames (0.24 s) of audible output
        n_first = 3

        from mlx_audio_tpu.models.tts.sesame.model import _first_audio_fused

        def run_ttfa(seed):
            """The round-4 production first-chunk path: prefill + 3 frames
            + stateful Mimi decode fused into ONE dispatch (one host
            round trip + one fetch instead of four; docs/PERF.md)."""
            key = jax.random.PRNGKey(seed)
            bucket = _prompt_bucket(t)
            pad = bucket - t
            tokens = np.zeros((b, bucket, nc1), dtype=np.int32)
            mask = np.zeros((b, bucket, nc1), dtype=bool)
            tokens[:, pad:] = prompt_tokens
            mask[:, pad:] = prompt_mask
            pad_len = jnp.full((b,), pad, dtype=jnp.int32)
            caches = model.model.backbone.init_cache(
                b, max_len=bucket + max_frames, dtype=model.model.lm_dtype()
            )
            key, k0 = jax.random.split(key)
            state = model.mimi.init_state(b)
            audio, frames, caches, state = _first_audio_fused(
                model.model, model.mimi, caches, pad_len,
                jnp.asarray(tokens), jnp.asarray(mask), k0, state,
                temp, top_k, n_first=n_first,
            )
            audio_np = np.asarray(audio)[0, 0]
            if not args.no_watermark:
                audio_np = model._watermark(audio_np)
            return audio_np

        for s in (10_001, 10_002):
            t0 = time.perf_counter()
            a = run_ttfa(s)
            print(f"warmup {s}: {time.perf_counter()-t0:.1f}s ({a.shape[0]} samples)")
        times = []
        for s in range(args.iters):
            t0 = time.perf_counter()
            a = run_ttfa(s)
            dt = time.perf_counter() - t0
            times.append(dt)
            print(f"iter {s}: ttfa {dt*1000:.0f} ms for "
                  f"{a.shape[0]/24000:.2f}s of audio")
        med = sorted(times)[len(times) // 2]
        print(f"median time-to-first-audio: {med*1000:.0f} ms "
              f"({n_first} frames = {n_first*0.08:.2f}s audio, batch {b})")
        if args.json:
            import json
            print(json.dumps({"metric": "csm1b_ttfa_ms", "value":
                              round(med * 1000, 1), "unit": "ms"}))
        return

    # compile + one drained run (first drain pays runtime re-init)
    for s in (10_001, 10_002):
        t0 = time.perf_counter()
        audio = run(s)
        print(f"warmup {s}: {time.perf_counter()-t0:.1f}s "
              f"({audio.shape[0]} samples)")

    audio_sec = max_frames * 0.08 * b
    times = []
    for s in range(args.iters):
        t0 = time.perf_counter()
        audio = run(s)
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"iter {s}: {dt:.3f}s  rtf={audio_sec/dt:.2f}x realtime")

    med = sorted(times)[len(times) // 2]
    print(f"median: {med:.3f}s for {audio_sec:.2f} audio-sec (batch {b}) "
          f"=> {audio_sec/med:.2f}x realtime "
          f"({max_frames * b/med:.1f} frames/s)")
    if args.json:
        import json
        print(json.dumps({"metric": "csm1b_realtime_factor",
                          "value": round(audio_sec / med, 2), "unit": "x",
                          "batch": b, "dtype": args.dtype}))


if __name__ == "__main__":
    main()
