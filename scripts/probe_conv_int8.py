#!/usr/bin/env python
"""Timeboxed VERDICT r2 #9 probe: can int8 inputs lift the Kokoro/BigVGAN
resblock conv stack past XLA's bf16 conv emitter (~23% MXU)?

Variants per shape (effective useful TFLOP/s):
  bf16      jax.lax.conv_general_dilated bf16 (the production path)
  int8      same conv with s8 lhs/rhs, preferred_element_type=int32
  int8_dot  dense-k residue-stream decomposition as s8 dot_generals

Usage: python scripts/probe_conv_int8.py [--iters 10] [--batch 32]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    b = args.batch
    shapes = [
        (78000, 128, 7, 1), (78000, 128, 7, 3),
        (78000, 128, 11, 5), (13000, 256, 7, 1),
    ]
    rng = np.random.default_rng(0)

    def timeit(fn, *a):
        out = fn(*a)
        float(jnp.sum(jnp.abs(out.astype(jnp.float32))))
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = fn(*a)
            float(jnp.sum(jnp.abs(out.astype(jnp.float32))))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    def conv(x, w, d):
        k = w.shape[0]
        pad = (k - 1) * d // 2
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding=((pad, pad),),
            rhs_dilation=(d,), dimension_numbers=("NHC", "HIO", "NHC"),
        )

    def conv_s8(x, w, d):
        k = w.shape[0]
        pad = (k - 1) * d // 2
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding=((pad, pad),),
            rhs_dilation=(d,), dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.int32,
        )

    for (L, C, K, d) in shapes:
        x = jnp.asarray(rng.standard_normal((b, L, C)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((K, C, C)) * 0.05, jnp.bfloat16)
        x8 = jnp.asarray(rng.integers(-127, 127, (b, L, C)), jnp.int8)
        w8 = jnp.asarray(rng.integers(-127, 127, (K, C, C)), jnp.int8)
        flops = 2 * b * L * C * C * K

        t_bf16 = timeit(jax.jit(lambda x, w, dd=d: conv(x, w, dd)), x, w)
        print(f"L={L} C={C} K={K} d={d}: bf16 {t_bf16*1e3:7.2f} ms "
              f"{flops/t_bf16/1e12:6.1f} TF/s", flush=True)
        try:
            t_s8 = timeit(jax.jit(lambda x, w, dd=d: conv_s8(x, w, dd)),
                          x8, w8)
            print(f"{'':24s}  int8 {t_s8*1e3:7.2f} ms "
                  f"{flops/t_s8/1e12:6.1f} TOP/s", flush=True)
        except Exception as e:
            print(f"{'':24s}  int8 conv unsupported: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
