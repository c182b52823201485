"""Fused int8 streaming draft kernel for the CSM depth decoder.

The depth decoder is 31 sequential ~112M-param steps per 80 ms frame and
already runs at ~85% of HBM speed-of-light in bf16 (docs/PERF.md) — the
only single-chip lever left is moving fewer bytes.  This kernel runs the
whole 30-step tail of the per-frame loop (c2..c31; reference loop
sesame.py:379-393) inside ONE pallas_call:

* weights are int8 (per-128-row-group symmetric scales) streamed
  HBM->VMEM chunk-by-chunk with double-buffered DMA — half the bytes of
  the bf16 scan, and the full-precision weights never exist anywhere;
* the KV cache lives in VMEM scratch across the sequential grid steps;
* sampling happens in-kernel via Gumbel-argmax over top-k-masked logits
  with *precomputed* noise rows, so an XLA-side verifier can reproduce
  the decision exactly from bf16 logits (speculative exactness:
  models/tts/sesame — draft here, verify in bf16, fall back per frame).

Greedy (temp=0) uses zero noise => argmax, so a perfect int8 draft equals
the bf16 greedy sequence and verification preserves frame-exactness.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

GROUP = 128          # quant group along the contraction dim
CHUNK_COLS = 4096    # streaming chunk width (VMEM budget)


def _gsz(n: int) -> int:
    """Effective group size for a contraction dim (tiny test configs have
    dims below GROUP; one group then covers the whole dim)."""
    return GROUP if n % GROUP == 0 else n


def _pad_to(x: np.ndarray, axis: int, mult: int) -> np.ndarray:
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    width = [(0, 0)] * x.ndim
    width[axis] = (0, pad)
    return np.pad(x, width)


def quantize_int8(w: np.ndarray):
    """W [In, Out] -> (codes int8 [In, Out], scales f32 [In/g, Out]),
    symmetric per-group max-abs (g = _gsz(In))."""
    ing, out = w.shape
    gs = _gsz(ing)
    g = ing // gs
    wg = w.reshape(g, gs, out)
    scale = np.abs(wg).max(axis=1) / 127.0 + 1e-12   # [g, out]
    codes = np.clip(np.round(wg / scale[:, None, :]), -127, 127)
    return codes.reshape(ing, out).astype(np.int8), scale.astype(np.float32)


class PackedDepth(NamedTuple):
    """Device-ready int8 pack of the depth decoder (see pack_depth)."""

    wqkv: jax.Array        # [L, Dm, Cqkv]   int8
    sqkv: jax.Array        # [L, Dm/G, Cqkv] f32
    wo: jax.Array          # [L, Dm, Dm]
    so: jax.Array
    wgu: jax.Array         # [L, Dm, 2F]
    sgu: jax.Array
    wdown: jax.Array       # [L, F, Dm]
    sdown: jax.Array
    norms: jax.Array       # [L, 2, Dm] f32 (input / post-attn RMS weights)
    final_norm: jax.Array  # [Dm]
    heads: jax.Array       # [S, Dm, Vp] int8 (audio_head[1..30], padded)
    sheads: jax.Array      # [S, Dm/G, Vp]
    emb_proj: jax.Array    # [S, Vp, Dm] bf16: per-codebook embedding tables
    #                        (codebooks 1..30) pre-multiplied by the
    #                        backbone->decoder projection; row `tok` of slab
    #                        s is the decoder input embedding for token
    #                        c_{s+1}.  Pre-projecting keeps the dynamic
    #                        "row fetch" expressible as a one-hot matmul on
    #                        a slab DMA'd at an (untiled) leading index —
    #                        single-row DMA from a tiled HBM array is not.
    rope_cos: jax.Array    # [P, Dh] f32 rows for positions 0..P-1
    rope_sin: jax.Array


def pack_depth(decoder, projection_w: np.ndarray, audio_head: np.ndarray,
               embed_table: np.ndarray, vocab: int) -> PackedDepth:
    """Quantize + lay out the depth decoder for the streaming kernel.

    decoder: models/lm/llama.LlamaModel (the CSM depth LM);
    projection_w: [Db, Dm]; audio_head: [nc-1, Dm, V];
    embed_table: [nc*V, Db].
    """
    layers = decoder.layers
    qkv_c, o_c, gu_c, dn_c = [], [], [], []
    qkv_s, o_s, gu_s, dn_s = [], [], [], []
    norms = []
    for lyr in layers:
        a = lyr.self_attn if hasattr(lyr, "self_attn") else lyr.attn
        # Linear stores weight [out, in]; kernel wants x @ W => [in, out]
        wq = np.asarray(a.q_proj.weight, np.float32).T
        wk = np.asarray(a.k_proj.weight, np.float32).T
        wv = np.asarray(a.v_proj.weight, np.float32).T
        c, s = quantize_int8(np.concatenate([wq, wk, wv], axis=1))
        qkv_c.append(c), qkv_s.append(s)
        c, s = quantize_int8(np.asarray(a.o_proj.weight, np.float32).T)
        o_c.append(c), o_s.append(s)
        m = lyr.mlp
        c, s = quantize_int8(np.concatenate(
            [np.asarray(m.gate_proj.weight, np.float32).T,
             np.asarray(m.up_proj.weight, np.float32).T], axis=1))
        gu_c.append(c), gu_s.append(s)
        c, s = quantize_int8(np.asarray(m.down_proj.weight, np.float32).T)
        dn_c.append(c), dn_s.append(s)
        norms.append(np.stack([
            np.asarray(lyr.input_layernorm.weight, np.float32),
            np.asarray(lyr.post_attention_layernorm.weight, np.float32),
        ]))

    hp_c, hp_s = [], []
    for h in audio_head[1:]:                       # heads for c2..c31
        hw = _pad_to(np.asarray(h, np.float32), 1, 128)
        c, s = quantize_int8(hw)
        hp_c.append(c), hp_s.append(s)
    vpad = hp_c[0].shape[1]

    # per-codebook embedding tables (codebooks 1..30, the draft inputs)
    # pre-multiplied by the backbone->decoder projection, padded to Vp rows
    nc = audio_head.shape[0] + 1
    emb = np.asarray(embed_table, np.float32).reshape(nc, vocab, -1)
    proj = np.asarray(projection_w, np.float32)            # [Db, Dm]
    ep = np.einsum("cvb,bd->cvd", emb[1: nc - 1], proj)
    ep = _pad_to(ep, 1, vpad)[:, :vpad]

    return PackedDepth(
        wqkv=jnp.asarray(np.stack(qkv_c)), sqkv=jnp.asarray(np.stack(qkv_s)),
        wo=jnp.asarray(np.stack(o_c)), so=jnp.asarray(np.stack(o_s)),
        wgu=jnp.asarray(np.stack(gu_c)), sgu=jnp.asarray(np.stack(gu_s)),
        wdown=jnp.asarray(np.stack(dn_c)), sdown=jnp.asarray(np.stack(dn_s)),
        norms=jnp.asarray(np.stack(norms)),
        final_norm=jnp.asarray(np.asarray(decoder.norm.weight, np.float32)),
        heads=jnp.asarray(np.stack(hp_c)), sheads=jnp.asarray(np.stack(hp_s)),
        emb_proj=jnp.asarray(ep, dtype=jnp.bfloat16),
        rope_cos=decoder.rope_cos[:64], rope_sin=decoder.rope_sin[:64],
    )


def dequant_ref(codes: jax.Array, scales: jax.Array) -> jax.Array:
    """XLA reference dequant (verification / tests)."""
    ing, out = codes.shape
    gs = _gsz(ing)
    w = codes.astype(jnp.float32).reshape(ing // gs, gs, out)
    return (w * scales[:, None, :]).reshape(ing, out)


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _rms(x, w, eps=1e-5):
    xf = x.astype(jnp.float32)
    return xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True)
                              + eps) * w


def _quant_row(xin):
    """f32 [1, In] -> (s8 [1, In], f32 scale).  Symmetric per-row max-abs.
    The matmuls below feed the MXU native s8 x s8 -> s32 — an int8->bf16
    VPU unpack of the streamed weights costs ~1 ms/step (measured), which
    is 3x the whole bf16 scan; integer MXU keeps the kernel DMA-bound.
    Identical formula in kernel and XLA mirror (token-exact tests)."""
    amax = jnp.maximum(jnp.max(jnp.abs(xin)), 1e-30)
    inv = 127.0 / amax
    xq = jnp.clip(jnp.round(xin * inv), -127.0, 127.0).astype(jnp.int8)
    return xq, amax * (1.0 / 127.0)


def _dot_s8(xq, wq):
    """s8 [1, n] @ s8 [n, m] -> s32 [1, m] on the MXU."""
    return jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def _depth_kernel(
    # inputs (HBM unless noted)
    wqkv, sqkv, wo, so, wgu, sgu, wdown, sdown,
    norms_ref,        # VMEM [L, 2, Dm]
    fnorm_ref,        # VMEM [1, Dm]
    heads, sheads,    # HBM
    emb_proj,         # HBM [S, Vp, Dm] bf16
    cos_ref, sin_ref,  # VMEM [P, Dh]
    cache0_k, cache0_v,  # HBM [L, Hkv, Cap, Dh] initial (prefilled) cache
    noise_ref,        # VMEM [S, Vp] f32
    tok0_ref,         # SMEM [1] int32 (c1)
    # outputs
    tok_out,          # SMEM [1, Sp] int32
    # scratch
    buf_a, buf_b, sc_a, sc_b,       # streaming slots
    gu_buf, head_buf, shead_buf, emb_buf, attn_buf,
    k_cache, v_cache, prev_tok,
    dma_sems,
    *, n_layers, dm, f_inter, hq, hkv, dh, cap, vocab, vpad, n_steps,
    temp, top_k,
):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _init():
        kdma = pltpu.make_async_copy(cache0_k, k_cache, dma_sems.at[4])
        kdma.start()
        vdma = pltpu.make_async_copy(cache0_v, v_cache, dma_sems.at[5])
        vdma.start()
        kdma.wait()
        vdma.wait()
        prev_tok[0] = tok0_ref[0]

    pos = s + 2                         # cache write position of this step
    tok = prev_tok[0]

    # ---- kick off slab DMAs (embedding table + head; leading-dim index
    # of a >=3D HBM array is untiled, so a dynamic `s` is legal) ----------
    edma = pltpu.make_async_copy(emb_proj.at[s], emb_buf, dma_sems.at[2])
    edma.start()
    hdma = pltpu.make_async_copy(heads.at[s], head_buf, dma_sems.at[6])
    hdma.start()
    hsdma = pltpu.make_async_copy(sheads.at[s], shead_buf, dma_sems.at[7])
    hsdma.start()

    # ---- x = row `tok` of the pre-projected embedding slab, fetched as a
    # one-hot matmul on the MXU (dynamic-row vector loads are not
    # expressible; one nonzero product per column keeps it exact) ---------
    edma.wait()
    oh_lane = jax.lax.broadcasted_iota(jnp.int32, (1, vpad), 1)
    onehot = (oh_lane == tok).astype(jnp.bfloat16)
    x = jax.lax.dot_general(
        onehot, emb_buf[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [1, Dm]

    # ---- transformer layers (weights streamed, double-buffered) ---------
    def stream_matmul(xin, w_hbm, s_hbm, in_rows, out_cols, l):
        """y [1, out_cols] = xin [1, in_rows] @ dequant(W[l]); chunks the
        output columns, double-buffering chunk DMAs; s8 MXU dots."""
        n_chunks = out_cols // CHUNK_COLS if out_cols >= CHUNK_COLS else 1
        cw = out_cols // n_chunks
        outs = []
        xq, sx = _quant_row(xin)
        # prologue: start chunk 0 into slot A
        slots = ((buf_a, sc_a, dma_sems.at[0], dma_sems.at[1]),
                 (buf_b, sc_b, dma_sems.at[2], dma_sems.at[3]))

        def start(j, slot):
            wbuf, sbuf, wsem, ssem = slot
            d1 = pltpu.make_async_copy(
                w_hbm.at[l, :, pl.ds(j * cw, cw)],
                wbuf.at[: in_rows, : cw], wsem)
            d1.start()
            d2 = pltpu.make_async_copy(
                s_hbm.at[l, :, pl.ds(j * cw, cw)],
                sbuf.at[: in_rows // _gsz(in_rows), : cw], ssem)
            d2.start()
            return d1, d2

        pending = start(0, slots[0])
        for j in range(n_chunks):
            cur = slots[j % 2]
            d1, d2 = pending
            if j + 1 < n_chunks:
                nxt = start(j + 1, slots[(j + 1) % 2])
            d1.wait()
            d2.wait()
            if j + 1 < n_chunks:
                pending = nxt
            wbuf, sbuf, _, _ = cur
            acc = jnp.zeros((1, cw), jnp.float32)
            gsm = _gsz(in_rows)
            for g in range(in_rows // gsm):
                part = _dot_s8(xq[:, g * gsm:(g + 1) * gsm],
                               wbuf[g * gsm:(g + 1) * gsm, : cw])
                acc = acc + part.astype(jnp.float32) * (
                    sbuf[g:g + 1, : cw] * sx)
            outs.append(acc)
        return jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]

    cqkv = (hq + 2 * hkv) * dh
    for l in range(n_layers):
        xn = _rms(x, norms_ref[l, 0])
        qkv = stream_matmul(xn, wqkv, sqkv, dm, cqkv, l)  # [1, cqkv]
        q = qkv[0, : hq * dh].reshape(hq, dh)
        k = qkv[0, hq * dh: (hq + hkv) * dh].reshape(hkv, dh)
        v = qkv[0, (hq + hkv) * dh:].reshape(hkv, dh)

        c = cos_ref[pl.ds(pos, 1), :]          # [1, Dh/2]
        si = sin_ref[pl.ds(pos, 1), :]

        def rope(t):
            t1 = t[:, : dh // 2]
            t2 = t[:, dh // 2:]
            return jnp.concatenate(
                [t1 * c - t2 * si, t2 * c + t1 * si], axis=1)

        q = rope(q)
        k = rope(k)
        k_cache[l, :, pl.ds(pos, 1), :] = k[:, None, :]
        v_cache[l, :, pl.ds(pos, 1), :] = v[:, None, :]

        kc = k_cache[l]                         # [Hkv, Cap, Dh]
        vc = v_cache[l]
        qg = q.reshape(hkv, hq // hkv, dh)
        scores = jax.lax.dot_general(
            qg, kc, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * (1.0 / (dh ** 0.5))                 # [Hkv, Hq/Hkv, Cap]
        jpos = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2)
        scores = jnp.where(jpos <= pos, scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jax.lax.dot_general(
            probs, vc, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                        # [Hkv, Hq/Hkv, Dh]
        attn_buf[:] = attn.reshape(1, hq * dh)
        y = stream_matmul(attn_buf[:], wo, so, hq * dh, dm, l)
        x = x + y

        xn2 = _rms(x, norms_ref[l, 1])
        gu = stream_matmul(xn2, wgu, sgu, dm, 2 * f_inter, l)
        h = jax.nn.silu(gu[:, :f_inter]) * gu[:, f_inter:]
        gu_buf[:] = h
        # down: [F, Dm] — stream along the CONTRACTION dim in row chunks
        rc = min(CHUNK_COLS, f_inter)
        n_rc = f_inter // rc
        y2 = jnp.zeros((1, dm), jnp.float32)
        slots = ((buf_a, sc_a, dma_sems.at[0], dma_sems.at[1]),
                 (buf_b, sc_b, dma_sems.at[2], dma_sems.at[3]))

        def dstart(j, slot):
            wbuf, sbuf, wsem, ssem = slot
            d1 = pltpu.make_async_copy(
                wdown.at[l, pl.ds(j * rc, rc), :],
                wbuf.at[: rc, : dm], wsem)
            d1.start()
            d2 = pltpu.make_async_copy(
                sdown.at[l, pl.ds(j * (rc // _gsz(rc)), rc // _gsz(rc)), :],
                sbuf.at[: rc // _gsz(rc), : dm], ssem)
            d2.start()
            return d1, d2

        hq8, sh = _quant_row(gu_buf[:])
        pending = dstart(0, slots[0])
        for j in range(n_rc):
            cur = slots[j % 2]
            d1, d2 = pending
            if j + 1 < n_rc:
                nxt = dstart(j + 1, slots[(j + 1) % 2])
            d1.wait()
            d2.wait()
            if j + 1 < n_rc:
                pending = nxt
            wbuf, sbuf, _, _ = cur
            gsd = _gsz(rc)
            for g in range(rc // gsd):
                part = _dot_s8(
                    hq8[:, j * rc + g * gsd: j * rc + (g + 1) * gsd],
                    wbuf[g * gsd:(g + 1) * gsd, : dm])
                y2 = y2 + part.astype(jnp.float32) * (
                    sbuf[g:g + 1, : dm] * sh)
        x = x + y2

    # ---- logits + sampling ----------------------------------------------
    xf = _rms(x, fnorm_ref[0])
    hdma.wait()
    hsdma.wait()
    xfq, sf = _quant_row(xf)
    logits = jnp.zeros((1, vpad), jnp.float32)
    gh = _gsz(dm)
    for g in range(dm // gh):
        part = _dot_s8(xfq[:, g * gh:(g + 1) * gh],
                       head_buf[g * gh:(g + 1) * gh, :])
        logits = logits + part.astype(jnp.float32) * (
            shead_buf[g:g + 1, :] * sf)
    lane = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(lane < vocab, logits, -jnp.inf)

    if temp > 0:
        z = logits / temp
        if 0 < top_k < vocab:
            # k-th largest via 24-iteration value bisection
            lo0 = jnp.min(jnp.where(lane < vocab, z, jnp.inf))
            hi0 = jnp.max(z)

            def bis(_, lh):
                lo, hi = lh
                mid = 0.5 * (lo + hi)
                n_ge = jnp.sum((z >= mid).astype(jnp.int32))
                return jnp.where(n_ge >= top_k, mid, lo), jnp.where(
                    n_ge >= top_k, hi, mid)

            lo, hi = jax.lax.fori_loop(0, 24, bis, (lo0, hi0))
            z = jnp.where(z >= lo, z, -jnp.inf)
        z = z + noise_ref[pl.ds(s, 1), :]
    else:
        z = logits
    nxt_tok = jnp.argmax(z).astype(jnp.int32)
    prev_tok[0] = nxt_tok
    # scalar store at dynamic index: tok_out lives in SMEM (a dynamic
    # *lane* offset vector store is not expressible on the VPU)
    tok_out[0, s] = nxt_tok


@functools.partial(jax.jit, static_argnames=("vocab", "temp", "top_k",
                                              "interpret"))
def depth_draft_pallas(packed: PackedDepth, cache_k0: jax.Array,
                       cache_v0: jax.Array, c1: jax.Array,
                       noise: jax.Array, vocab: int, temp: float = 0.0,
                       top_k: int = 0, interpret: bool = False) -> jax.Array:
    """Draft c2..c31 for ONE frame.  cache_k0/v0: [L, Hkv, Cap, Dh] f32 with
    positions 0..1 prefilled (bf16 prefill happens outside); c1: [] int32;
    noise: [S, Vp] f32 Gumbel rows (zeros for greedy).
    Returns tokens [S] int32 (S = nc - 2 = 30)."""
    n_layers, hkv, cap, dh = cache_k0.shape
    dm = packed.wqkv.shape[1]
    f_inter = packed.wdown.shape[1]
    cqkv = packed.wqkv.shape[2]
    vpad = packed.heads.shape[2]
    n_steps, _ = noise.shape
    hq = (cqkv // dh) - 2 * hkv
    sp = -(-n_steps // 8) * 8

    max_in = max(dm, CHUNK_COLS)
    max_cols = max(dm, CHUNK_COLS, cqkv if cqkv < CHUNK_COLS else CHUNK_COLS)

    kern = functools.partial(
        _depth_kernel, n_layers=n_layers, dm=dm, f_inter=f_inter,
        hq=hq, hkv=hkv, dh=dh, cap=cap, vocab=vocab, vpad=vpad,
        n_steps=n_steps, temp=temp, top_k=top_k,
    )
    vm = pltpu.VMEM
    out = pl.pallas_call(
        kern,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # wqkv
            pl.BlockSpec(memory_space=pl.ANY),   # sqkv
            pl.BlockSpec(memory_space=pl.ANY),   # wo
            pl.BlockSpec(memory_space=pl.ANY),   # so
            pl.BlockSpec(memory_space=pl.ANY),   # wgu
            pl.BlockSpec(memory_space=pl.ANY),   # sgu
            pl.BlockSpec(memory_space=pl.ANY),   # wdown
            pl.BlockSpec(memory_space=pl.ANY),   # sdown
            pl.BlockSpec(memory_space=vm),          # norms
            pl.BlockSpec(memory_space=vm),          # final norm [1, Dm]
            pl.BlockSpec(memory_space=pl.ANY),   # heads
            pl.BlockSpec(memory_space=pl.ANY),   # sheads
            pl.BlockSpec(memory_space=pl.ANY),   # emb_proj
            pl.BlockSpec(memory_space=vm),          # cos
            pl.BlockSpec(memory_space=vm),          # sin
            pl.BlockSpec(memory_space=pl.ANY),   # cache k0
            pl.BlockSpec(memory_space=pl.ANY),   # cache v0
            pl.BlockSpec(memory_space=vm),          # noise
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tok0
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, sp), jnp.int32),
        scratch_shapes=[
            vm((max_in, max_cols), jnp.int8),       # buf_a
            vm((max_in, max_cols), jnp.int8),       # buf_b
            vm((max(1, max_in // GROUP), max_cols), jnp.float32),  # sc_a
            vm((max(1, max_in // GROUP), max_cols), jnp.float32),  # sc_b
            vm((1, f_inter), jnp.float32),          # gu_buf
            vm((dm, vpad), jnp.int8),               # head_buf
            vm((max(1, dm // GROUP), vpad), jnp.float32),   # shead_buf
            vm((vpad, dm), jnp.bfloat16),           # emb_buf
            vm((1, dm), jnp.float32),               # attn_buf
            vm((n_layers, hkv, cap, dh), jnp.float32),  # k_cache
            vm((n_layers, hkv, cap, dh), jnp.float32),  # v_cache
            pltpu.SMEM((1,), jnp.int32),            # prev_tok
            pltpu.SemaphoreType.DMA((8,)),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(packed.wqkv, packed.sqkv, packed.wo, packed.so, packed.wgu,
      packed.sgu, packed.wdown, packed.sdown, packed.norms,
      packed.final_norm[None], packed.heads, packed.sheads,
      packed.emb_proj, packed.rope_cos, packed.rope_sin,
      cache_k0, cache_v0, noise, c1[None].astype(jnp.int32))
    return out[0, :n_steps]


# ---------------------------------------------------------------------------
# XLA mirror of the kernel math (tests + CPU fallback): same packed int8
# weights, same bisection top-k, same Gumbel-argmax — token-exact vs the
# kernel.
# ---------------------------------------------------------------------------


def _topk_bisect_mask(z: jax.Array, lane_valid: jax.Array,
                      top_k: int) -> jax.Array:
    lo0 = jnp.min(jnp.where(lane_valid, z, jnp.inf))
    hi0 = jnp.max(z)

    def bis(_, lh):
        lo, hi = lh
        mid = 0.5 * (lo + hi)
        n_ge = jnp.sum((z >= mid).astype(jnp.int32))
        return (jnp.where(n_ge >= top_k, mid, lo),
                jnp.where(n_ge >= top_k, hi, mid))

    lo, _ = jax.lax.fori_loop(0, 24, bis, (lo0, hi0))
    return jnp.where(z >= lo, z, -jnp.inf)


@functools.partial(jax.jit, static_argnames=("vocab", "temp", "top_k"))
def depth_draft_xla(packed: PackedDepth, cache_k0: jax.Array,
                    cache_v0: jax.Array, c1: jax.Array, noise: jax.Array,
                    vocab: int, temp: float = 0.0,
                    top_k: int = 0) -> jax.Array:
    """Reference implementation of the draft over the SAME int8 pack."""
    n_layers, hkv, cap, dh = cache_k0.shape
    dm = packed.wqkv.shape[1]
    f_inter = packed.wdown.shape[1]
    cqkv = packed.wqkv.shape[2]
    vpad = packed.heads.shape[2]
    n_steps = noise.shape[0]
    hq = (cqkv // dh) - 2 * hkv

    def step(carry, s):
        kc, vc, tok = carry
        pos = s + 2
        # row `tok` of the pre-projected per-codebook slab (the kernel
        # fetches it as a one-hot bf16 matmul — exact, one product/col)
        x = jax.lax.dynamic_slice(
            packed.emb_proj, (s, tok, 0), (1, 1, dm)
        )[0].astype(jnp.float32)

        for l in range(n_layers):
            xn = _rms(x, packed.norms[l, 0])
            qkv = mm_scaled(xn, packed.wqkv[l], packed.sqkv[l])
            q = qkv[0, : hq * dh].reshape(hq, dh)
            k = qkv[0, hq * dh: (hq + hkv) * dh].reshape(hkv, dh)
            v = qkv[0, (hq + hkv) * dh:].reshape(hkv, dh)
            c = jax.lax.dynamic_slice(packed.rope_cos, (pos, 0),
                                      (1, dh // 2))
            si = jax.lax.dynamic_slice(packed.rope_sin, (pos, 0),
                                       (1, dh // 2))

            def rope(t):
                t1, t2 = t[:, : dh // 2], t[:, dh // 2:]
                return jnp.concatenate(
                    [t1 * c - t2 * si, t2 * c + t1 * si], axis=1)

            q, k = rope(q), rope(k)
            kc = jax.lax.dynamic_update_slice(kc, k[None, :, None, :],
                                              (l, 0, pos, 0))
            vc = jax.lax.dynamic_update_slice(vc, v[None, :, None, :],
                                              (l, 0, pos, 0))
            qg = q.reshape(hkv, hq // hkv, dh)
            scores = jax.lax.dot_general(
                qg, kc[l], (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * (1.0 / (dh ** 0.5))
            jpos = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2)
            scores = jnp.where(jpos <= pos, scores, -1e9)
            probs = jax.nn.softmax(scores, axis=-1)
            attn = jax.lax.dot_general(
                probs, vc[l], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            y = mm_scaled(attn.reshape(1, hq * dh), packed.wo[l],
                          packed.so[l])
            x = x + y
            xn2 = _rms(x, packed.norms[l, 1])
            gu = mm_scaled(xn2, packed.wgu[l], packed.sgu[l])
            h = jax.nn.silu(gu[:, :f_inter]) * gu[:, f_inter:]
            y2 = mm_scaled(h, packed.wdown[l], packed.sdown[l])
            x = x + y2

        xf = _rms(x, packed.final_norm)
        head = packed.heads[s]
        logits = mm_scaled(xf, head, packed.sheads[s])
        lane = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        valid = lane < vocab
        logits = jnp.where(valid, logits, -jnp.inf)
        if temp > 0:
            z = logits / temp
            if 0 < top_k < vocab:
                z = _topk_bisect_mask(z, valid, top_k)
            z = z + jax.lax.dynamic_slice(noise, (s, 0), (1, vpad))
        else:
            z = logits
        nxt = jnp.argmax(z).astype(jnp.int32)
        return (kc, vc, nxt), nxt

    def mm_scaled(xin, codes, scales):
        """Kernel-faithful grouped matmul: quantize the activation row,
        s8 x s8 -> s32 dots per group, scale partials in f32 — the same
        op order as the kernel, so tokens match bit-for-bit."""
        acc = jnp.zeros((1, codes.shape[1]), jnp.float32)
        xq, sx = _quant_row(xin)
        ing = codes.shape[0]
        gsm = _gsz(ing)
        for g in range(ing // gsm):
            part = _dot_s8(xq[:, g * gsm:(g + 1) * gsm],
                           codes[g * gsm:(g + 1) * gsm])
            acc = acc + part.astype(jnp.float32) * (scales[g:g + 1] * sx)
        return acc

    (_, _, _), toks = jax.lax.scan(
        step, (cache_k0, cache_v0, c1.astype(jnp.int32)),
        jnp.arange(n_steps))
    return toks
