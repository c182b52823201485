#!/usr/bin/env python
"""Probe the beam-search candidate selection: lax.top_k over [A, K*V]
(whisper beam5: [4, 259330] -> top 10) vs an iterative max+mask loop
(k iterations of a full-row max: exact, bandwidth-bound, no sort
network).  Also the decoder-only step for reference.

Usage: python scripts/probe_beam_topk.py [--iters 20]
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
    ap.add_argument("--steps", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    A, K, V = 4, 5, 51866
    steps = args.steps
    rng = np.random.default_rng(0)
    cand0 = jnp.asarray(rng.standard_normal((A, K * V)), jnp.float32)
    key = jax.random.PRNGKey(0)

    def timeit(name, fn, *a):
        out = fn(*a)
        float(jnp.sum(jnp.abs(jax.tree_util.tree_leaves(out)[0]
                              .astype(jnp.float32))))
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = fn(*a)
            float(jnp.sum(jnp.abs(jax.tree_util.tree_leaves(out)[0]
                                  .astype(jnp.float32))))
            ts.append(time.perf_counter() - t0)
        med = sorted(ts)[len(ts) // 2]
        print(f"{name:12s} {med/steps*1e6:8.1f} us/step", flush=True)

    @jax.jit
    def scan_topk(cand, key):
        def body(c, k):
            vals, idx = jax.lax.top_k(c, 2 * K)
            c = c + (vals[:, :1] * 0 + jax.random.uniform(k, (A, 1))) * 1e-9
            return c, (vals, idx)
        keys = jax.random.split(key, steps)
        _, outs = jax.lax.scan(body, cand, keys)
        return outs

    @jax.jit
    def scan_itermax(cand, key):
        def topk_iter(c):
            vals, idxs = [], []
            cc = c
            for _ in range(2 * K):
                i = jnp.argmax(cc, axis=-1)
                v = jnp.take_along_axis(cc, i[:, None], axis=-1)[:, 0]
                vals.append(v)
                idxs.append(i)
                cc = cc.at[jnp.arange(A), i].set(-jnp.inf)
            return jnp.stack(vals, -1), jnp.stack(idxs, -1).astype(jnp.int32)

        def body(c, k):
            vals, idx = topk_iter(c)
            c = c + (vals[:, :1] * 0 + jax.random.uniform(k, (A, 1))) * 1e-9
            return c, (vals, idx)
        keys = jax.random.split(key, steps)
        _, outs = jax.lax.scan(body, cand, keys)
        return outs

    @jax.jit
    def scan_seg(cand, key):
        """Two-stage: segment max (128-wide) -> top_k over segments ->
        exact top-2K by re-ranking candidates from winning segments only is
        NOT exact in general; instead: per-row partial sort via reshape
        [A, S, 128] max over lanes iteratively.  Here: simple exact
        hierarchy — top_k(2K) over segment maxima picks >= ... (probe
        the building block cost: segment max + top_k over S)."""
        S = (K * V) // 128

        def body(c, k):
            seg = jnp.max(c[:, : S * 128].reshape(A, S, 128), axis=-1)
            vals, idx = jax.lax.top_k(seg, 2 * K)
            c = c + (vals[:, :1] * 0 + jax.random.uniform(k, (A, 1))) * 1e-9
            return c, (vals, idx)
        keys = jax.random.split(key, steps)
        _, outs = jax.lax.scan(body, cand, keys)
        return outs

    timeit("topk", scan_topk, cand0, key)
    timeit("itermax", scan_itermax, cand0, key)
    timeit("segmax+topk", scan_seg, cand0, key)

    # correctness: itermax == topk (values)
    v1, _ = jax.lax.top_k(cand0, 2 * K)
    cc = cand0
    vs = []
    for _ in range(2 * K):
        i = jnp.argmax(cc, axis=-1)
        vs.append(jnp.take_along_axis(cc, i[:, None], axis=-1)[:, 0])
        cc = cc.at[jnp.arange(A), i].set(-jnp.inf)
    v2 = jnp.stack(vs, -1)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2))
    print("itermax values == lax.top_k values")


if __name__ == "__main__":
    main()
