#!/usr/bin/env python
"""Decompose the causal-LM decode step at Qwen2-0.5B dims (VERDICT r2 #2:
258 tok/s batch-1 = ~38% of HBM speed-of-light; find where the 3.9 ms go).

Times, as isolated jits with data-dependent sync (axon queue gotcha):
  chunk     the production _decode_chunk per token (reference point)
  nohead    32-step scan of layers only (no lm_head, no sampler)
  head      lm_head matvec alone ([B,896] @ [896,166k])
  sampler   top-k bisection sampler alone on [B,166k] logits
  layer1    one transformer layer step alone
  scan32    32-step scan of full step+head+sampler (chunk without host)

Usage: python scripts/profile_causal.py [--batch 1] [--iters 20]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--steps", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mlx_audio_tpu.models.lm.causal import LlamaForCausalLM
    from mlx_audio_tpu.models.lm.llama import LlamaConfig
    from mlx_audio_tpu.models.sampling import sample_top_k_rows

    cfg = LlamaConfig(
        num_hidden_layers=24, num_attention_heads=14, num_key_value_heads=2,
        head_dim=64, hidden_size=896, intermediate_size=4864,
        rms_norm_eps=1e-6, vocab_size=166_000, max_position_embeddings=32768,
        rope_theta=1_000_000, tie_word_embeddings=True, qkv_bias=True,
    )
    lm = LlamaForCausalLM(cfg).astype(jnp.bfloat16)
    b = args.batch
    steps = args.steps
    caches = lm.model.init_cache(b, max_len=1024, dtype=jnp.bfloat16)
    pad_len = jnp.zeros((b,), jnp.int32)
    tok = jnp.ones((b,), jnp.int32)
    key = jax.random.PRNGKey(0)
    h_fixed = jnp.ones((b, 896), jnp.bfloat16)
    logits_fixed = jnp.asarray(
        np.random.default_rng(0).standard_normal((b, 166_000)), jnp.float32)

    def timeit(name, fn, *a, per=1):
        out = fn(*a)
        # data-dependent sync (block_until_ready returns early on axon)
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
        print(f"{name:10s} {med*1e3:8.3f} ms total  {med/per*1e6:8.1f} us/unit",
              flush=True)
        return med / per

    # -- full scan chunk: step + head + sampler, `steps` tokens ------------
    @jax.jit
    def scan_full(lm, caches, tok, key):
        def body(carry, k):
            caches_s, prev = carry
            h, caches_s = lm.model.step(caches_s, prev[:, None], pad_len)
            logits = lm.logits(h[:, -1]).astype(jnp.float32)
            nxt = sample_top_k_rows(k, logits, 0.8, 50)
            return (caches_s, nxt), nxt
        keys = jax.random.split(key, steps)
        (caches, tok), toks = jax.lax.scan(body, (caches, tok), keys)
        return toks

    # -- scan of layers only (no head, no sampler) -------------------------
    @jax.jit
    def scan_nohead(lm, caches, tok):
        def body(carry, _):
            caches_s, prev = carry
            h, caches_s = lm.model.step(caches_s, prev[:, None], pad_len)
            nxt = jnp.clip(h[:, -1, 0].astype(jnp.int32) % 100, 0, 99)
            return (caches_s, nxt), nxt
        (caches, tok), toks = jax.lax.scan(body, (caches, tok), None,
                                           length=steps)
        return toks

    # -- scan of head-only matvecs (fresh h each step to avoid CSE) --------
    @jax.jit
    def scan_head(lm, h):
        def body(carry, _):
            hh = carry
            logits = lm.logits(hh[:, None])[:, -1].astype(jnp.float32)
            hh = hh + logits[:, :1].astype(hh.dtype) * 1e-9
            return hh, logits[:, 0]
        h, outs = jax.lax.scan(body, h, None, length=steps)
        return outs

    # -- scan of sampler only ---------------------------------------------
    @jax.jit
    def scan_sampler(logits, key):
        def body(carry, k):
            lg = carry
            nxt = sample_top_k_rows(k, lg, 0.8, 50)
            lg = lg + nxt[:, None].astype(lg.dtype) * 1e-9
            return lg, nxt
        keys = jax.random.split(key, steps)
        _, toks = jax.lax.scan(body, logits, keys)
        return toks

    # -- one layer step alone ----------------------------------------------
    layer = lm.model.layers[0]
    cache0 = caches[0]
    rope = (lm.model.rope_cos, lm.model.rope_sin)

    @jax.jit
    def scan_layer(layer, cache, h):
        def body(carry, _):
            cache_s, hh = carry
            pos = cache_s.idx + jnp.arange(1)
            jmask = jnp.arange(cache_s.k.shape[-2])[None, None, None, :]
            mask = jnp.where(jmask <= pos[None, :, None], 0.0, -1e9)
            out, cache_s = layer(hh[:, None], rope, pos, mask, cache_s)
            return (cache_s, out[:, -1]), out[:, -1, 0]
        (cache, h), outs = jax.lax.scan(body, (cache, h), None, length=steps)
        return outs

    print(f"batch={b} steps={steps} (Qwen2-0.5B dims, bf16)", flush=True)
    t_full = timeit("scan32", scan_full, lm, caches, tok, key, per=steps)
    t_nohead = timeit("nohead", scan_nohead, lm, caches, tok, per=steps)
    t_head = timeit("head", scan_head, lm, h_fixed, per=steps)
    t_sampler = timeit("sampler", scan_sampler, logits_fixed, key, per=steps)
    t_layer = timeit("layer1", scan_layer, layer, cache0, h_fixed, per=steps)

    head_bytes = 166_000 * 896 * 2
    layer_bytes = (896 * 896 * 2 + 896 * 128 * 2 * 2 + 896 * 4864 * 3 * 2)
    print(f"\nper-token: full {t_full*1e6:.0f} us | layers(24) "
          f"{t_nohead*1e6:.0f} us | head {t_head*1e6:.0f} us "
          f"(SoL {head_bytes/819e9*1e6:.0f} us) | sampler "
          f"{t_sampler*1e6:.0f} us | layer1 {t_layer*1e6:.0f} us "
          f"(SoL {layer_bytes/819e9*1e6:.0f} us)")
    print(f"head BW: {head_bytes/t_head/1e9:.0f} GB/s; layer BW: "
          f"{layer_bytes/t_layer/1e9:.0f} GB/s; layers-total BW: "
          f"{24*layer_bytes/t_nohead/1e9:.0f} GB/s")


if __name__ == "__main__":
    main()
