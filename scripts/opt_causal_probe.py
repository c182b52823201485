#!/usr/bin/env python
"""Probe optimization candidates for the causal-LM decode step at
Qwen2-0.5B dims (follow-up to profile_causal.py, which localized the
3.9 ms/token to: layers 1.86 ms @364 GB/s, lm_head 1.28 ms @233 GB/s,
top-k sampler 1.04 ms).

Candidates, each as a 32-step scan (us/step, bf16, batch 1):
  samp_bisect   current sample_top_k_rows (48-iteration value bisection)
  samp_topk     lax.top_k(50) + categorical over the 50 + index gather
  samp_approx   lax.approx_max_k(50) variant (TPU-native partial sort)
  head_aslinear current tied-embedding as_linear (h @ W.T)
  head_wh       dot_general(W, h): contract on 896 with W as LHS
  layer_cur     one layer step (current separate q/k/v + gate/up GEMMs)
  layer_fused   one layer step with pre-concatenated qkv + gate_up weights
  step_fused    full 24-layer step + head + topk-sampler, fused weights

Usage: python scripts/opt_causal_probe.py [--iters 20]
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
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mlx_audio_tpu.models.lm.causal import LlamaForCausalLM
    from mlx_audio_tpu.models.lm.llama import LlamaConfig
    from mlx_audio_tpu.models.sampling import sample_top_k_rows
    from mlx_audio_tpu.nn import apply_rope, scaled_dot_product_attention

    V, D, I, HKV, HD = 166_000, 896, 4864, 2, 64
    cfg = LlamaConfig(
        num_hidden_layers=24, num_attention_heads=14, num_key_value_heads=HKV,
        head_dim=HD, hidden_size=D, intermediate_size=I,
        rms_norm_eps=1e-6, vocab_size=V, max_position_embeddings=32768,
        rope_theta=1_000_000, tie_word_embeddings=True, qkv_bias=True,
    )
    lm = LlamaForCausalLM(cfg).astype(jnp.bfloat16)
    steps = args.steps
    rng = np.random.default_rng(0)
    logits_f = jnp.asarray(rng.standard_normal((1, V)), jnp.float32)
    h_fixed = jnp.asarray(rng.standard_normal((1, D)) * 0.02, jnp.bfloat16)
    key = jax.random.PRNGKey(0)

    def timeit(name, fn, *a, per=steps):
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
        print(f"{name:14s} {med/per*1e6:8.1f} us/step", flush=True)
        return med / per

    def scan(body, carry0):
        @jax.jit
        def run(carry, key):
            keys = jax.random.split(key, steps)
            carry, outs = jax.lax.scan(body, carry, keys)
            return outs
        return lambda: run(carry0, key)

    def scan_args(body, carry0, *bigs):
        """Like scan, but threads big weight arrays as jit ARGS so they
        don't bake into the HLO (the remote-compile payload rejects
        100MB-class constants)."""
        @jax.jit
        def run(carry, key, *b):
            keys = jax.random.split(key, steps)
            carry, outs = jax.lax.scan(
                lambda c, k: body(c, k, *b), carry, keys)
            return outs
        return lambda: run(carry0, key, *bigs)

    probes = {}

    # -- samplers ----------------------------------------------------------
    def b_bisect(carry, k):
        lg = carry
        t = sample_top_k_rows(k, lg, 0.8, 50)
        return lg + t[:, None] * 1e-9, t

    probes["samp_bisect"] = scan(b_bisect, logits_f)

    def topk_sample(k, lg, temp, kk):
        vals, idx = jax.lax.top_k(lg, kk)          # [B, k]
        keys = jax.vmap(jax.random.fold_in, (None, 0))(
            k, jnp.arange(lg.shape[0]))
        pick = jax.vmap(lambda kr, v: jax.random.categorical(kr, v / temp)
                        )(keys, vals)
        return jnp.take_along_axis(idx, pick[:, None], axis=1)[:, 0]

    def b_topk(carry, k):
        lg = carry
        t = topk_sample(k, lg, 0.8, 50).astype(jnp.int32)
        return lg + t[:, None] * 1e-9, t

    probes["samp_topk"] = scan(b_topk, logits_f)

    def approx_sample(k, lg, temp, kk):
        vals, idx = jax.lax.approx_max_k(lg, kk)
        keys = jax.vmap(jax.random.fold_in, (None, 0))(
            k, jnp.arange(lg.shape[0]))
        pick = jax.vmap(lambda kr, v: jax.random.categorical(kr, v / temp)
                        )(keys, vals)
        return jnp.take_along_axis(idx, pick[:, None], axis=1)[:, 0]

    def b_approx(carry, k):
        lg = carry
        t = approx_sample(k, lg, 0.8, 50).astype(jnp.int32)
        return lg + t[:, None] * 1e-9, t

    probes["samp_approx"] = scan(b_approx, logits_f)

    def tau_sample(k, lg, temp, kk):
        """Exact sorted-filter semantics: tau = kth largest via lax.top_k,
        ties at tau kept, then full-vocab categorical."""
        z = lg / temp
        vals, _ = jax.lax.top_k(z, kk)
        tau = vals[..., -1:]
        z = jnp.where(z < tau, -jnp.inf, z)
        keys = jax.vmap(jax.random.fold_in, (None, 0))(
            k, jnp.arange(lg.shape[0]))
        return jax.vmap(lambda kr, zz: jax.random.categorical(kr, zz)
                        )(keys, z).astype(jnp.int32)

    def b_tau(carry, k):
        lg = carry
        t = tau_sample(k, lg, 0.8, 50)
        return lg + t[:, None] * 1e-9, t

    probes["samp_tau"] = scan(b_tau, logits_f)

    # -- lm head -----------------------------------------------------------
    W = lm.model.embed_tokens.weight                      # [V, D] bf16
    WT = jnp.asarray(np.asarray(W).T)                     # [D, V] copy

    def b_head_aslinear(carry, _, w):
        hh = carry
        lg = (hh @ w.T).astype(jnp.float32)
        return hh + lg[:, :1].astype(hh.dtype) * 1e-9, lg[:, 0]

    probes["head_aslinear"] = scan_args(b_head_aslinear, h_fixed, W)

    def b_head_wh(carry, _, w):
        hh = carry
        lg = jax.lax.dot_general(w, hh, (((1,), (1,)), ((), ()))
                                 ).astype(jnp.float32).T   # [1, V]
        return hh + lg[:, :1].astype(hh.dtype) * 1e-9, lg[:, 0]

    probes["head_wh"] = scan_args(b_head_wh, h_fixed, W)

    def b_head_pret(carry, _, wt):
        hh = carry
        lg = (hh @ wt).astype(jnp.float32)                 # [1, V]
        return hh + lg[:, :1].astype(hh.dtype) * 1e-9, lg[:, 0]

    probes["head_pret"] = scan_args(b_head_pret, h_fixed, WT)

    # -- layer: current vs fused-weight step -------------------------------
    layer = lm.model.layers[0]
    att = layer.self_attn
    qkv_w = jnp.concatenate([att.q_proj.weight, att.k_proj.weight,
                             att.v_proj.weight], axis=0)   # [1152, 896]
    qkv_b = jnp.concatenate([att.q_proj.bias, att.k_proj.bias,
                             att.v_proj.bias], axis=0)
    gu_w = jnp.concatenate([layer.mlp.gate_proj.weight,
                            layer.mlp.up_proj.weight], axis=0)  # [9728, 896]
    cos, sin = lm.model.rope_cos, lm.model.rope_sin
    kcache = jnp.zeros((1, HKV, 1024, HD), jnp.bfloat16)
    vcache = jnp.zeros((1, HKV, 1024, HD), jnp.bfloat16)

    def layer_cur(hh, kc, vc, pos):
        x = layer.input_layernorm(hh)[:, None]
        q = att.q_proj(x).reshape(1, 1, 14, HD).transpose(0, 2, 1, 3)
        k = att.k_proj(x).reshape(1, 1, HKV, HD).transpose(0, 2, 1, 3)
        v = att.v_proj(x).reshape(1, 1, HKV, HD).transpose(0, 2, 1, 3)
        q = apply_rope(q, cos, sin, pos)
        k = apply_rope(k, cos, sin, pos)
        kc = jax.lax.dynamic_update_slice(kc, k, (0, 0, pos[0], 0))
        vc = jax.lax.dynamic_update_slice(vc, v, (0, 0, pos[0], 0))
        mask = jnp.where(jnp.arange(1024)[None, None, None, :] <= pos[0],
                         0.0, -1e9)
        o = scaled_dot_product_attention(q, kc, vc, mask)
        hh = hh + att.o_proj(o.transpose(0, 2, 1, 3).reshape(1, 1, 14 * HD))[:, 0]
        x2 = layer.post_attention_layernorm(hh)
        hh = hh + layer.mlp.down_proj(
            jax.nn.silu(layer.mlp.gate_proj(x2)) * layer.mlp.up_proj(x2))
        return hh, kc, vc

    def layer_fused(hh, kc, vc, pos):
        x = layer.input_layernorm(hh)[:, None]
        qkv = x @ qkv_w.T + qkv_b
        q = qkv[..., :896].reshape(1, 1, 14, HD).transpose(0, 2, 1, 3)
        k = qkv[..., 896:1024].reshape(1, 1, HKV, HD).transpose(0, 2, 1, 3)
        v = qkv[..., 1024:].reshape(1, 1, HKV, HD).transpose(0, 2, 1, 3)
        q = apply_rope(q, cos, sin, pos)
        k = apply_rope(k, cos, sin, pos)
        kc = jax.lax.dynamic_update_slice(kc, k, (0, 0, pos[0], 0))
        vc = jax.lax.dynamic_update_slice(vc, v, (0, 0, pos[0], 0))
        mask = jnp.where(jnp.arange(1024)[None, None, None, :] <= pos[0],
                         0.0, -1e9)
        o = scaled_dot_product_attention(q, kc, vc, mask)
        hh = hh + att.o_proj(o.transpose(0, 2, 1, 3).reshape(1, 1, 14 * HD))[:, 0]
        x2 = layer.post_attention_layernorm(hh)
        gu = x2 @ gu_w.T
        hh = hh + layer.mlp.down_proj(jax.nn.silu(gu[..., :I]) * gu[..., I:])
        return hh, kc, vc

    def make_layer_scan(fn):
        def body(carry, _):
            hh, kc, vc, step = carry
            hh, kc, vc = fn(hh, kc, vc, step[None])
            return (hh, kc, vc, step + 1), hh[0, 0]
        @jax.jit
        def run(h0):
            (_, _, _, _), outs = jax.lax.scan(
                body, (h0, kcache, vcache, jnp.asarray(0, jnp.int32)), None,
                length=steps)
            return outs
        return lambda: run(h_fixed)

    probes["layer_cur"] = make_layer_scan(layer_cur)
    probes["layer_fused"] = make_layer_scan(layer_fused)

    # -- end-to-end step variants (the decision metric) --------------------
    caches0 = lm.model.init_cache(1, max_len=1024, dtype=jnp.bfloat16)
    pad_len = jnp.zeros((1,), jnp.int32)
    tok0 = jnp.ones((1,), jnp.int32)

    def make_full(sampler):
        @jax.jit
        def run(lm, caches, tok, key):
            def body(carry, k):
                caches_s, prev = carry
                h, caches_s = lm.model.step(caches_s, prev[:, None], pad_len)
                logits = lm.logits(h[:, -1]).astype(jnp.float32)
                nxt = sampler(k, logits)
                return (caches_s, nxt), nxt
            keys = jax.random.split(key, steps)
            (caches, tok), toks = jax.lax.scan(body, (caches, tok), keys)
            return toks
        return lambda: run(lm, caches0, tok0, key)

    probes["full_bisect"] = make_full(
        lambda k, lg: sample_top_k_rows(k, lg, 0.8, 50))
    probes["full_topk"] = make_full(
        lambda k, lg: topk_sample(k, lg, 0.8, 50).astype(jnp.int32))
    probes["full_greedy"] = make_full(
        lambda k, lg: jnp.argmax(lg, axis=-1).astype(jnp.int32))
    probes["full_tau"] = make_full(lambda k, lg: tau_sample(k, lg, 0.8, 50))

    # -- full 24-layer step with per-layer FUSED qkv + gate_up GEMMs -------
    # (the isolated layer probes are distorted by per-scan overhead; this
    # is the end-to-end comparison that decides the production change)
    import numpy as _np

    fused = []
    for lyr in lm.model.layers:
        at = lyr.self_attn
        fused.append(dict(
            ln1=lyr.input_layernorm.weight,
            ln2=lyr.post_attention_layernorm.weight,
            wqkv=jnp.concatenate([at.q_proj.weight, at.k_proj.weight,
                                  at.v_proj.weight], axis=0),
            bqkv=jnp.concatenate([at.q_proj.bias, at.k_proj.bias,
                                  at.v_proj.bias], axis=0),
            wo=at.o_proj.weight,
            wgu=jnp.concatenate([lyr.mlp.gate_proj.weight,
                                 lyr.mlp.up_proj.weight], axis=0),
            wdown=lyr.mlp.down_proj.weight,
        ))
    fused_stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *fused)
    norm_w = lm.model.norm.weight
    cos, sin = lm.model.rope_cos, lm.model.rope_sin
    Wemb = lm.model.embed_tokens.weight
    eps = 1e-6

    def rms(x, w):
        x32 = x.astype(jnp.float32)
        x32 = x32 * jax.lax.rsqrt(
            jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
        return (x32 * w).astype(x.dtype)

    @jax.jit
    def full_fused(params, wemb, nw, kcs, vcs, tok, key):
        def body(carry, k):
            kcs, vcs, prev, pos = carry
            hh = wemb[prev]                      # [1, D] embed row
            def layer_body(h_kv, p):
                h, kc, vc = h_kv
                x = rms(h, p["ln1"])[:, None]
                qkv = x @ p["wqkv"].T + p["bqkv"]
                q = qkv[..., :896].reshape(1, 1, 14, HD).transpose(0, 2, 1, 3)
                kx = qkv[..., 896:1024].reshape(1, 1, HKV, HD).transpose(0, 2, 1, 3)
                vx = qkv[..., 1024:].reshape(1, 1, HKV, HD).transpose(0, 2, 1, 3)
                q = apply_rope(q, cos, sin, pos[None])
                kx = apply_rope(kx, cos, sin, pos[None])
                kc = jax.lax.dynamic_update_slice(kc, kx, (0, 0, pos, 0))
                vc = jax.lax.dynamic_update_slice(vc, vx, (0, 0, pos, 0))
                mask = jnp.where(
                    jnp.arange(kc.shape[-2])[None, None, None, :] <= pos,
                    0.0, -1e9)
                o = scaled_dot_product_attention(q, kc, vc, mask)
                h = h + (o.transpose(0, 2, 1, 3).reshape(1, 14 * HD)
                         @ p["wo"].T)
                x2 = rms(h, p["ln2"])
                gu = x2 @ p["wgu"].T
                h = h + (jax.nn.silu(gu[..., :I]) * gu[..., I:]) @ p["wdown"].T
                return (h, kc, vc), None

            # manual python loop over layers (weights are a stacked pytree;
            # index per layer keeps each GEMM a separate op like production)
            h = hh
            new_k, new_v = [], []
            for li in range(24):
                p = jax.tree_util.tree_map(lambda x: x[li], params)
                (h, kc, vc), _ = layer_body((h, kcs[li], vcs[li]), p)
                new_k.append(kc)
                new_v.append(vc)
            h = rms(h, nw)
            logits = (h @ wemb.T).astype(jnp.float32)
            nxt = topk_sample(k, logits, 0.8, 50).astype(jnp.int32)
            return (new_k, new_v, nxt, pos + 1), nxt

        keys = jax.random.split(key, steps)
        (_, _, _, _), toks = jax.lax.scan(
            body, (kcs, vcs, tok, jnp.asarray(0, jnp.int32)), keys)
        return toks

    kcs0 = [jnp.zeros((1, HKV, 1024, HD), jnp.bfloat16) for _ in range(24)]
    vcs0 = [jnp.zeros((1, HKV, 1024, HD), jnp.bfloat16) for _ in range(24)]
    tok0f = jnp.ones((1,), jnp.int32)
    probes["full_fused"] = lambda: full_fused(
        fused_stack, Wemb, norm_w, kcs0, vcs0, tok0f, key)

    # int8 weight-only head: does XLA stream half the bytes?
    Wq = jnp.asarray(
        np.clip(np.round(np.asarray(W, np.float32)
                         / (np.abs(np.asarray(W, np.float32)).max(1,
                            keepdims=True) / 127 + 1e-8)),
                -127, 127).astype(np.int8))
    scale = jnp.asarray(
        (np.abs(np.asarray(W, np.float32)).max(1, keepdims=True) / 127
         ).astype(np.float32)[:, 0])

    def b_head_int8(carry, _, wq, sc):
        hh = carry
        lg = jax.lax.dot_general(
            hh.astype(jnp.bfloat16), wq.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ()))).astype(jnp.float32) * sc[None]
        return hh + lg[:, :1].astype(hh.dtype) * 1e-9, lg[:, 0]

    probes["head_int8"] = scan_args(b_head_int8, h_fixed, Wq, scale)

    for name, fn in probes.items():
        if args.only and args.only not in name:
            continue
        timeit(name, fn)


if __name__ == "__main__":
    main()
