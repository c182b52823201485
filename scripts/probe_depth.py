#!/usr/bin/env python
"""Isolate the depth-draft kernel's bottleneck: DMA streaming rate vs
batch-1 matvec compute rate, each alone in a pallas kernel shaped like one
draft step (4 layers x 28 MB int8).

Modes (comma-separated in --modes, all run in one process):
  dma    strided column-slice chunks, 2 in flight (the kernel's scheme)
  dmac   contiguous pre-chunked layout, 2 in flight
  dma8   contiguous, 8 chunks in flight
  dmabig contiguous, ONE 28 MB DMA per layer, 2 layers in flight
  mxu    s8 dots on a resident chunk, same dot count as a step
  vpu    broadcast-multiply-accumulate matvec on a resident chunk
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import functools
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="dma,dmac,dma8,dmabig,mxu,vpu")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--chunk", type=int, default=4096)
    ap.add_argument("--dtype", default="int8", choices=["int8", "bf16"])
    ap.add_argument("--kcols", type=int, default=28,
                    help="streamed cols = kcols*1024 per layer")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L, dm, f = 4, 1024, 8192
    cw = args.chunk
    cols = args.kcols * 1024
    n_chunks = cols // cw
    dt = np.int8 if args.dtype == "int8" else np.float16  # bf16 via view

    rng = np.random.default_rng(0)
    w_np = rng.integers(-127, 127, size=(L, dm, cols)).astype(dt)
    import jax.numpy as _jnp
    w_strided = _jnp.asarray(w_np)
    if args.dtype == "bf16":
        w_strided = w_strided.astype(_jnp.bfloat16)
    w_chunked = jnp.asarray(jnp.reshape(
        jnp.transpose(jnp.reshape(w_strided, (L, dm, n_chunks, cw)),
                      (0, 2, 1, 3)), (L * n_chunks, dm, cw)))
    x = jnp.asarray(rng.integers(-127, 127, size=(1, dm), dtype=np.int8))

    itemsize = 2 if args.dtype == "bf16" else 1
    wdt = jnp.bfloat16 if args.dtype == "bf16" else jnp.int8

    def make(mode):
        if mode == "mxu" and args.dtype != "int8":
            raise SystemExit("mxu mode probes s8 dot throughput; use int8")
        n_bufs = {"dma": 2, "dmac": 2, "dma8": 8, "dmabig": 2,
                  "mxu": 1}[mode]
        big = mode == "dmabig"

        def kern(w_hbm, x_ref, out_ref, bufs, acc, sems):
            if big:
                for l in range(L):
                    d = pltpu.make_async_copy(
                        w_hbm.at[pl.ds(l * n_chunks, n_chunks)],
                        bufs.at[l % 2], sems.at[l % 2])
                    d.start()
                    if l > 0:
                        pltpu.make_async_copy(
                            w_hbm.at[pl.ds((l - 1) * n_chunks, n_chunks)],
                            bufs.at[(l - 1) % 2], sems.at[(l - 1) % 2]
                        ).wait()
                pltpu.make_async_copy(
                    w_hbm.at[pl.ds((L - 1) * n_chunks, n_chunks)],
                    bufs.at[(L - 1) % 2], sems.at[(L - 1) % 2]).wait()
                acc[0:1, :] = bufs[0, 0, 0:1, :].astype(jnp.float32)
                out_ref[0, 0] = acc[0, 0]
                return

            def start(l, j):
                slot = (l * n_chunks + j) % n_bufs
                if mode == "dma":
                    d = pltpu.make_async_copy(
                        w_hbm.at[l, :, pl.ds(j * cw, cw)],
                        bufs.at[slot], sems.at[slot])
                else:
                    d = pltpu.make_async_copy(
                        w_hbm.at[l * n_chunks + j], bufs.at[slot],
                        sems.at[slot])
                d.start()
                return d

            if mode in ("dma", "dmac", "dma8"):
                flat = [(l, j) for l in range(L) for j in range(n_chunks)]
                pend = []
                for idx in range(min(n_bufs, len(flat))):
                    pend.append(start(*flat[idx]))
                for idx in range(len(flat)):
                    pend[idx % n_bufs].wait()
                    nxt = idx + n_bufs
                    if nxt < len(flat):
                        pend[idx % n_bufs] = start(*flat[nxt])
                acc[0:1, :cw] = bufs[0, 0:1, :].astype(jnp.float32)
            else:  # mxu: s8 dots on a resident chunk (vpu mode: make_vpu)
                a = jnp.zeros((1, cw), jnp.int32)
                for l in range(L):
                    for j in range(n_chunks):
                        for g in range(dm // 128):
                            a = a + jax.lax.dot_general(
                                x_ref[:, g * 128:(g + 1) * 128],
                                bufs[0, g * 128:(g + 1) * 128, :],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
                acc[0:1, :] = a.astype(jnp.float32)
            out_ref[0, 0] = acc[0, 0]

        if big:
            bufshape = (2, n_chunks, dm, cw)
        else:
            bufshape = (n_bufs, dm, cw)
        return pl.pallas_call(
            kern,
            grid=(args.steps,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM(bufshape, wdt),
                pltpu.VMEM((8, cw), jnp.float32),
                pltpu.SemaphoreType.DMA((max(2, n_bufs),)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
        )

    def make_vpu():
        """Pure-compute probe: resident int8 [dm/8, 8, cw] weights,
        broadcast-multiply-accumulate matvec, same element count/step."""
        def kern(x3_ref, out_ref, bufs3, acc):
            a = jnp.zeros((8, cw), jnp.float32)
            x3 = x3_ref[:].astype(jnp.float32)[:, :, 0:1]  # [dm/8, 8, 1]
            for l in range(L):
                for j in range(n_chunks):
                    w3 = bufs3[:].astype(jnp.float32)
                    a = a + jnp.sum(w3 * x3, axis=0)
            acc[0:1, :] = jnp.sum(a, axis=0, keepdims=True)
            out_ref[0, 0] = acc[0, 0]

        return pl.pallas_call(
            kern,
            grid=(args.steps,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((dm // 8, 8, cw), jnp.int8),
                pltpu.VMEM((8, cw), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
        )

    def make_auto():
        """Auto-pipelined BlockSpec streaming (Mosaic's own prefetcher) —
        no manual DMAs at all."""
        def kern(w_blk, out_ref, acc):
            s, i = pl.program_id(0), pl.program_id(1)

            @pl.when(jnp.logical_and(s == 0, i == 0))
            def _():
                acc[:] = jnp.zeros_like(acc)

            acc[0:1, :] = acc[0:1, :] + w_blk[0, 0:1, :].astype(jnp.float32)
            @pl.when(jnp.logical_and(s == args.steps - 1,
                                     i == L * n_chunks - 1))
            def _():
                out_ref[0, 0] = acc[0, 0]

        return pl.pallas_call(
            kern,
            grid=(args.steps, L * n_chunks),
            in_specs=[pl.BlockSpec((1, dm, cw), lambda s, i: (i, 0, 0))],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, cw), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
        )

    for mode in args.modes.split(","):
        if mode == "vpu":
            probe = make_vpu()
            x3 = jnp.asarray(rng.integers(
                -127, 127, size=(dm // 8, 8, 128), dtype=np.int8))
            jitted = jax.jit(lambda x, p=probe: p(x) + 0.0)
            t0 = time.perf_counter()
            np.asarray(jitted(x3))
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                np.asarray(jitted(x3))
                times.append(time.perf_counter() - t0)
            med = sorted(times)[len(times) // 2]
            by = L * dm * cols * args.steps * itemsize
            print(f"vpu: median {med*1e3:.2f} ms "
                  f"({med/args.steps*1e6:.0f} us/step, {by/med/1e9:.0f} "
                  f"GB/s-equiv)  [compile {compile_s:.1f}s]", flush=True)
            continue
        if mode == "auto":
            probe = make_auto()
            jitted = jax.jit(lambda w, p=probe: p(w) + 0.0)
            t0 = time.perf_counter()
            np.asarray(jitted(w_chunked))
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                np.asarray(jitted(w_chunked))
                times.append(time.perf_counter() - t0)
            med = sorted(times)[len(times) // 2]
            by = int(w_chunked.size) * w_chunked.dtype.itemsize * args.steps
            print(f"auto: median {med*1e3:.2f} ms "
                  f"({med/args.steps*1e6:.0f} us/step, {by/med/1e9:.0f} GB/s)"
                  f"  [compile {compile_s:.1f}s]", flush=True)
            continue
        wdev = w_strided if mode == "dma" else w_chunked
        probe = make(mode)
        jitted = jax.jit(lambda w, x, p=probe: p(w, x) + 0.0)
        t0 = time.perf_counter()
        np.asarray(jitted(wdev, x))
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            np.asarray(jitted(wdev, x))
            times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2]
        by = L * dm * cols * args.steps * itemsize
        print(f"{mode}: median {med*1e3:.2f} ms "
              f"({med/args.steps*1e6:.0f} us/step, {by/med/1e9:.0f} GB/s)"
              f"  [compile {compile_s:.1f}s]", flush=True)


if __name__ == "__main__":
    main()
