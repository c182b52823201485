#!/usr/bin/env python
"""Decompose the Dia decode step on chip (VERDICT r4 #8).

Times, each as ONE jitted 100-step scan at real Dia-1.6B dims, 2B = 16
CFG rows (batch 8):
  A. decoder.step only (no CFG/sampling)       -> the matmul+cache term
  B. decoder.step without the logits head      -> isolates the f32 head
  C. full _dia_chunk body (CFG + top-k + sample) -> sampling overhead

Timing per the repo recipe: data-dependent scalar fetch to drain the
tunnel queue (docs/PERF.md "Measured numbers are end-to-end").

Usage: python scripts/probe_dia_step.py [--batch 8] [--steps 100]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import time
from functools import partial

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mlx_audio_tpu.models.tts.dia.config import DiaConfig
    from mlx_audio_tpu.models.tts.dia.model import Model, _dia_chunk

    cfg = DiaConfig()
    model = Model(cfg, dac_model=object()).astype(jnp.bfloat16)
    dec = model.model.decoder
    b2 = 2 * args.batch
    c = dec.num_channels
    max_len = 512
    print(f"rows(2B)={b2} channels={c} steps={args.steps}")

    caches = dec.init_cache(b2, max_len, dtype=jnp.bfloat16)
    # encoder side: 64-bucket cross keys (post cross-trim shape)
    enc_out = jnp.zeros((b2, 64, cfg.model.encoder.n_embd), jnp.bfloat16)
    src_pos = jnp.broadcast_to(jnp.arange(64)[None], (b2, 64))
    cross_kvs = dec.precompute_cross_kv(enc_out, src_pos)
    ca_mask = jnp.ones((b2, 1, 1, 64), bool)
    tok0 = jnp.zeros((b2, c), jnp.int32)

    def sync(x):
        return float(jnp.sum(jnp.abs(jnp.asarray(x, jnp.float32))))

    @partial(jax.jit, static_argnames=("steps", "with_head"))
    def scan_step_only(model, caches, tok, steps: int, with_head: bool):
        dec = model.model.decoder

        def body(carry, step):
            caches_s, prev = carry
            if with_head:
                logits, caches_s = dec.step(
                    prev[:, None, :], step[None, None], caches_s, cross_kvs,
                    None, ca_mask)
                out = jnp.max(logits[:, -1])
            else:
                x = dec.embed(prev[:, None, :])
                new_caches = []
                for layer, cache, ckv in zip(dec.layers, caches_s,
                                             cross_kvs):
                    x, cache = layer.step(x, step[None, None], cache, ckv,
                                          None, ca_mask)
                    new_caches.append(cache)
                caches_s = new_caches
                out = jnp.max(dec.norm(x)).astype(jnp.float32)
            return (caches_s, prev), out

        (caches, _), outs = jax.lax.scan(
            body, (caches, tok), jnp.arange(steps))
        return outs

    def timeit(name, fn):
        fn()  # compile
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            sync(fn())
            times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2]
        print(f"{name}: {med*1000/args.steps:.2f} ms/step "
              f"({med:.3f}s / {args.steps})")
        return med

    a = timeit("A step+f32 head     ",
               lambda: scan_step_only(model, caches, tok0,
                                      steps=args.steps, with_head=True))
    b = timeit("B step, no head     ",
               lambda: scan_step_only(model, caches, tok0,
                                      steps=args.steps, with_head=False))

    key = jax.random.PRNGKey(0)
    delay = jnp.asarray(cfg.data.delay_pattern, jnp.int32)

    def full_chunk():
        preds, _, _ = _dia_chunk(
            model.model, caches, cross_kvs, ca_mask, tok0,
            jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32), delay,
            key, jnp.asarray(1026, jnp.int32), chunk=args.steps,
            temperature=1.3, top_k=35, cfg_scale=3.0, force_bos=False)
        return preds

    c_t = timeit("C full chunk body   ", full_chunk)
    print(f"head cost: {(a-b)*1000/args.steps:.2f} ms/step; "
          f"sampling+CFG cost: {(c_t-a)*1000/args.steps:.2f} ms/step")


if __name__ == "__main__":
    main()
