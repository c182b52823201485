#!/usr/bin/env python
"""Microbench: XLA conv emitter vs Pallas kernels on the ISTFTNet/BigVGAN
resblock shapes (the 76%-of-synthesis conv stack, docs/PERF.md).

Reports effective TFLOP/s (useful conv FLOPs / wall time; the banded
kernel's internal waste is *not* credited) for:
  xla     jax.lax.conv_general_dilated
  banded  banded_conv1d_pallas (+ residue fold for dilation > 1)

Usage: python scripts/bench_conv.py [--dtype bf16|f32] [--iters 20]
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
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mlx_audio_tpu.nn.layers import _dilated_conv1d_residue
    from mlx_audio_tpu.nn.pallas_ops import banded_conv1d_pallas

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    b = args.batch

    # (L, C, K, dilation) — stage-2 resblocks (C=128, L≈78k after both
    # upsamples at frame bucket 1300) and stage-1 (C=256, L≈13k)
    shapes = [
        (78000, 128, 7, 1), (78000, 128, 7, 3), (78000, 128, 7, 5),
        (78000, 128, 11, 1), (78000, 128, 11, 3), (78000, 128, 11, 5),
        (13000, 256, 7, 1), (13000, 256, 7, 3),
        (13000, 256, 11, 1),
    ]

    def xla_conv(x, w, d):
        k = w.shape[0]
        pad = (k - 1) * d // 2
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding=((pad, pad),),
            rhs_dilation=(d,), dimension_numbers=("NHC", "HIO", "NHC"),
        )

    def banded(x, w, d):
        if d == 1:
            return banded_conv1d_pallas(x, w)
        return _dilated_conv1d_residue(x, w, d, banded_conv1d_pallas)

    def sync(y):
        return float(jnp.sum(jnp.abs(y[:, :16, :8].astype(jnp.float32))))

    def time_fn(fn, x, w, d):
        f = jax.jit(lambda x, w: fn(x, w, d))  # d static via closure
        sync(f(x, w))          # compile
        sync(f(x, w))          # drain re-init
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            sync(f(x, w))
            times.append(time.perf_counter() - t0)
        return sorted(times)[len(times) // 2]

    rng = np.random.default_rng(0)
    print(f"batch={b} dtype={args.dtype}")
    print(f"{'shape':>28} {'xla':>9} {'banded':>9} {'speedup':>8}")
    tot_x = tot_b = 0.0
    for l, c, k, d in shapes:
        x = jnp.asarray(rng.standard_normal((b, l, c)) * 0.1, dtype=dtype)
        w = jnp.asarray(rng.standard_normal((k, c, c)) * 0.05, dtype=dtype)
        flops = 2 * b * l * c * c * k
        tx = time_fn(xla_conv, x, w, d)
        tb = time_fn(banded, x, w, d)
        tot_x += tx
        tot_b += tb
        print(f"L={l} C={c} K={k} d={d}".rjust(28)
              + f" {flops/tx/1e12:8.1f}T {flops/tb/1e12:8.1f}T"
              + f" {tx/tb:7.2f}x")
    print(f"{'TOTAL':>28} {tot_x*1000:8.1f}ms {tot_b*1000:7.1f}ms"
          f" {tot_x/tot_b:7.2f}x")


if __name__ == "__main__":
    main()
