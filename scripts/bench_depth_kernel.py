#!/usr/bin/env python
"""Microbench / fast compile-iteration driver for the CSM depth draft
kernel (nn/pallas_depth.depth_draft_pallas) at real llama-100M depth
decoder dimensions, without constructing the full 1.87B-param model.

Usage: python scripts/bench_depth_kernel.py [--iters 20] [--interpret]
       [--xla]  (run the XLA mirror instead)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--xla", action="store_true")
    ap.add_argument("--temp", type=float, default=0.0)
    ap.add_argument("--layers", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mlx_audio_tpu.nn.pallas_depth import (
        PackedDepth,
        depth_draft_pallas,
        depth_draft_xla,
        quantize_int8,
        _pad_to,
    )

    # llama-100M depth decoder dims (models/lm/llama.py:237)
    L, dm, db, f = args.layers, 1024, 2048, 8192
    hq, hkv, dh = 8, 2, 128
    nc, vocab = 32, 2051
    vpad = _pad_to(np.zeros((1, vocab), np.float32), 1, 128).shape[1]
    cap = 32
    n_steps = nc - 2  # 30

    rng = np.random.default_rng(0)

    def q(shape):
        w = rng.standard_normal(shape).astype(np.float32) * 0.02
        return quantize_int8(w)

    cqkv = (hq + 2 * hkv) * dh
    wqkv, sqkv = zip(*[q((dm, cqkv)) for _ in range(L)])
    wo, so = zip(*[q((dm, dm)) for _ in range(L)])
    wgu, sgu = zip(*[q((dm, 2 * f)) for _ in range(L)])
    wdn, sdn = zip(*[q((f, dm)) for _ in range(L)])
    heads, sheads = zip(*[q((dm, vpad)) for _ in range(n_steps)])

    inv = 1.0 / (10_000 ** (np.arange(0, dh, 2) / dh))
    t = np.arange(64)[:, None] * inv[None, :]
    emb_proj = np.zeros((n_steps, vpad, dm), np.float32)
    emb_proj[:, :vocab] = rng.standard_normal(
        (n_steps, vocab, dm)).astype(np.float32) * 0.02
    packed = PackedDepth(
        wqkv=jnp.asarray(np.stack(wqkv)), sqkv=jnp.asarray(np.stack(sqkv)),
        wo=jnp.asarray(np.stack(wo)), so=jnp.asarray(np.stack(so)),
        wgu=jnp.asarray(np.stack(wgu)), sgu=jnp.asarray(np.stack(sgu)),
        wdown=jnp.asarray(np.stack(wdn)), sdown=jnp.asarray(np.stack(sdn)),
        norms=jnp.asarray(rng.standard_normal((L, 2, dm)).astype(np.float32) * 0.01 + 1.0),
        final_norm=jnp.ones((dm,), jnp.float32),
        heads=jnp.asarray(np.stack(heads)), sheads=jnp.asarray(np.stack(sheads)),
        emb_proj=jnp.asarray(emb_proj, dtype=jnp.bfloat16),
        rope_cos=jnp.asarray(np.cos(t), jnp.float32),
        rope_sin=jnp.asarray(np.sin(t), jnp.float32),
    )
    ck = jnp.asarray(rng.standard_normal((L, hkv, cap, dh)).astype(np.float32))
    cv = jnp.asarray(rng.standard_normal((L, hkv, cap, dh)).astype(np.float32))
    c1 = jnp.asarray(7, jnp.int32)
    noise = jnp.zeros((n_steps, vpad), jnp.float32)

    fn = depth_draft_xla if args.xla else depth_draft_pallas
    kw = {} if args.xla else {"interpret": args.interpret}

    t0 = time.perf_counter()
    toks = np.asarray(fn(packed, ck, cv, c1, noise, vocab, args.temp, 50, **kw))
    print(f"compile+run: {time.perf_counter()-t0:.1f}s  toks={toks[:8]}...")

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(packed, ck, cv, c1, noise, vocab, args.temp, 50, **kw))
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    # int8 bytes actually streamed per call
    wbytes = sum(int(np.prod(a.shape)) for a in
                 (packed.wqkv, packed.wo, packed.wgu, packed.wdown)) * n_steps \
        + int(np.prod(packed.heads.shape)) \
        + int(np.prod(packed.emb_proj.shape)) * 2
    print(f"median {med*1000:.2f} ms for {n_steps} steps "
          f"({med/n_steps*1e3:.3f} ms/step, ~{wbytes/med/1e9:.0f} GB/s weight stream)")


if __name__ == "__main__":
    main()
