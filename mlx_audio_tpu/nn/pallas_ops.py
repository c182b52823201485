"""Pallas TPU kernels for hot ops.

The Kokoro duration/prosody stages are dominated by BiLSTM time loops: tiny
per-step matmuls whose cost is scan dispatch latency, not FLOPs.  This
kernel runs the whole recurrence inside one Pallas program — the recurrent
weight stays resident in VMEM, the hidden/cell state lives in VMEM scratch
across grid steps (TPU grid iterations execute sequentially), and each step
is one [B, H] x [H, 4H] MXU matmul plus VPU gate math.  No HBM roundtrip
per step.

Falls back to the lax.scan implementation (nn/recurrent.lstm_scan) off-TPU;
parity is tested in interpret mode.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

try:  # pallas is TPU/Mosaic; keep importable on any backend
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _lstm_kernel(xp_ref, wh_ref, h0_ref, c0_ref, out_ref, cs_ref, hT_ref,
                 cT_ref, h_scr, c_scr):
    """One grid step = one timestep.  xp block [1, B, 4H]; out block [1, B, H]
    (time leads so the block's trailing dims are the tile-aligned [B, 4H]).

    Gate packing follows torch LSTM: [i, f, g, o] along the 4H axis.
    """
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:].astype(jnp.float32)
        c_scr[:] = c0_ref[:].astype(jnp.float32)

    h = h_scr[:]
    c = c_scr[:]
    gates = xp_ref[0].astype(jnp.float32) + jnp.dot(
        h, wh_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32
    )
    hdim = h.shape[-1]
    i = jax.nn.sigmoid(gates[:, :hdim])
    f = jax.nn.sigmoid(gates[:, hdim:2 * hdim])
    g = jnp.tanh(gates[:, 2 * hdim:3 * hdim])
    o = jax.nn.sigmoid(gates[:, 3 * hdim:])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    h_scr[:] = h_new
    c_scr[:] = c_new
    out_ref[0] = h_new.astype(out_ref.dtype)
    cs_ref[0] = c_new.astype(cs_ref.dtype)

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        hT_ref[:] = h_new.astype(hT_ref.dtype)
        cT_ref[:] = c_new.astype(cT_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def lstm_pallas(x_proj: jax.Array, wh: jax.Array, h0: jax.Array,
                c0: jax.Array, interpret: bool = False):
    """Fused LSTM recurrence.

    x_proj: [B, T, 4H] — input projections (x @ Wx^T + b_ih + b_hh),
    wh:     [H, 4H]    — recurrent weight (transposed torch W_hh),
    h0/c0:  [B, H]     — initial state.
    Returns (hidden states [B, T, H], cell states [B, T, H], (h_T, c_T)).
    """
    b, t, h4 = x_proj.shape
    h = h4 // 4
    xp_t = jnp.swapaxes(x_proj, 0, 1)  # [T, B, 4H]
    hs, cs, hT, cT = pl.pallas_call(
        _lstm_kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b, h4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b, h), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, h), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t, b, h), x_proj.dtype),
            jax.ShapeDtypeStruct((t, b, h), x_proj.dtype),
            jax.ShapeDtypeStruct((b, h), x_proj.dtype),
            jax.ShapeDtypeStruct((b, h), x_proj.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((b, h), jnp.float32),
            pltpu.VMEM((b, h), jnp.float32),
        ],
        interpret=interpret,
    )(xp_t, wh, h0, c0)
    return jnp.swapaxes(hs, 0, 1), jnp.swapaxes(cs, 0, 1), (hT, cT)




def _env_on(name: str) -> bool:
    """Truthy env parse: '0'/'false'/'' count as off (a bare presence test
    would treat MLX_AUDIO_TPU_PALLAS_CONV=0 as on)."""
    return os.environ.get(name, "").strip().lower() not in ("", "0", "false")

def use_pallas_lstm() -> bool:
    """Pallas path is TPU-only; MLX_AUDIO_TPU_NO_PALLAS=1 disables it."""
    if not _HAS_PALLAS or _env_on("MLX_AUDIO_TPU_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# Fused dequantize-matmul (weight-only int8/int4 decode)
# ---------------------------------------------------------------------------
#
# AR decode is HBM-bound on weight reads; grouped-affine codes are 1 byte
# per parameter (4x less traffic than f32, 2x less than bf16).  The XLA
# path (nn/quantize._dequant + matmul) materializes the dequantized weight
# in HBM every step, which destroys the win.  This kernel streams uint8
# code tiles HBM->VMEM (pipelined by the grid), dequantizes in VMEM, and
# feeds the MXU directly — the full-precision weight never exists in HBM.


def _quant_matmul_kernel(x_ref, q_ref, s_ref, z_ref, o_ref, *, group_size,
                         packed):
    tile_o = q_ref.shape[0]
    # Mosaic has no direct uint8->f32 cast; hop through int32
    q = q_ref[:].astype(jnp.int32)
    if packed:
        # concat-half nibble layout (nn/quantize._pack4): low nibble =
        # column j, high nibble = column j + I/2 — unpack is two shifted
        # views concatenated, no interleave
        q = jnp.concatenate([q & 0xF, q >> 4], axis=1)
    i = q.shape[1]
    g = i // group_size
    s = s_ref[:].astype(jnp.float32)              # [TILE_O, G]
    z = z_ref[:].astype(jnp.float32)
    w = q.astype(jnp.float32).reshape(tile_o, g, group_size)
    w = (w * s[:, :, None] + z[:, :, None]).reshape(tile_o, i)
    x = x_ref[:]
    y = jax.lax.dot_general(
        x.astype(jnp.float32), w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "packed",
                                             "interpret"))
def quantized_matmul(x: jax.Array, codes: jax.Array, scales: jax.Array,
                     biases: jax.Array, group_size: int = 64,
                     packed: bool = False,
                     interpret: bool = False) -> jax.Array:
    """y[B, O] = x[B, I] @ dequant(codes[O, I or I/2]).T without
    materializing the dequantized weight in HBM.  Requires O % 128 == 0 and
    I % group_size == 0 (see quant_matmul_supported); ``packed`` codes hold
    two nibble codes per byte (half the HBM weight traffic of int8)."""
    b, i = x.shape
    o = codes.shape[0]
    stored = codes.shape[1]
    g = i // group_size
    tile_o = 128
    kern = functools.partial(_quant_matmul_kernel, group_size=group_size,
                             packed=packed)
    return pl.pallas_call(
        kern,
        grid=(o // tile_o,),
        in_specs=[
            pl.BlockSpec((b, i), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_o, stored), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_o, g), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_o, g), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, tile_o), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, o), x.dtype),
        interpret=interpret,
    )(x, codes, scales, biases)


def quant_matmul_supported(out_features: int, in_features: int,
                           group_size: int, packed: bool = False) -> bool:
    """Mosaic constraint: the in-kernel [O, G, group] dequant reshape needs
    a 128-aligned minor dim, so only 128-multiple group sizes hit the fused
    path (64-group checkpoints fall back to the XLA dense dequant); packed
    codes additionally need the stored I/2 minor dim 128-aligned."""
    ok = (out_features % 128 == 0 and in_features % group_size == 0
          and in_features % 128 == 0 and group_size % 128 == 0)
    if packed:
        ok = ok and (in_features // 2) % 128 == 0
    return ok


def use_pallas_quant() -> bool:
    if not _HAS_PALLAS or _env_on("MLX_AUDIO_TPU_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# Dilated conv1d as K shifted MXU matmuls
# ---------------------------------------------------------------------------
#
# The ISTFTNet/BigVGAN-style resblock convs ([B, ~156k, 128] activations,
# kernels 3/7/11, dilations 1/3/5) are 70%+ of Kokoro synthesis time; XLA's
# TPU conv emitter runs them at ~23% MXU (measured, docs/PERF.md).  A
# dilated conv with C-channel input is exactly sum_k x[l + k*d] @ w[k] —
# K [TILE_L, C] x [C, Cout] matmuls with a 128-multiple contraction, which
# the MXU runs near peak.  The kernel streams x tiles HBM->VMEM by hand
# (tiles overlap by (K-1)*d, which BlockSpec partitioning cannot express)
# and keeps all K weight matrices resident in VMEM.


def _dilated_conv_kernel(x_hbm, w_ref, out_ref, x_scr, sem, *,
                         kernel_size, dilation, tile_l, window):
    b = pl.program_id(0)
    i = pl.program_id(1)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * tile_l, window), :], x_scr, sem,
    )
    dma.start()
    dma.wait()
    c_out = out_ref.shape[-1]
    acc = jnp.zeros((tile_l, c_out), dtype=jnp.float32)
    for k in range(kernel_size):
        xk = x_scr[pl.ds(k * dilation, tile_l), :]
        acc += jnp.dot(xk, w_ref[k], preferred_element_type=jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("dilation", "interpret",
                                             "tile_l"))
def dilated_conv1d_pallas(x: jax.Array, w: jax.Array, dilation: int = 1,
                          interpret: bool = False,
                          tile_l: int = 2048) -> jax.Array:
    """'Same'-padded dilated conv, NLC: x [B, L, C] * w [K, C, Cout] ->
    [B, L, Cout].  K must be odd; C a multiple of 128 (MXU contraction)."""
    b, l, c = x.shape
    k, _, c_out = w.shape
    span = (k - 1) * dilation
    pad = span // 2
    n_tiles = -(-l // tile_l)
    # DMA slices must be sublane(8)-aligned: round the halo window up
    window = tile_l + (-(-span // 8) * 8)
    # host-side halo pad: pad lo for 'same'; pad hi so the last tile's DMA
    # window stays in bounds
    x_p = jnp.pad(
        x, ((0, 0), (pad, window - tile_l - pad + n_tiles * tile_l - l),
            (0, 0)),
    )
    kern = functools.partial(
        _dilated_conv_kernel, kernel_size=k, dilation=dilation, tile_l=tile_l,
        window=window,
    )
    out = pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((k, c, c_out), lambda bi, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_l, c_out), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * tile_l, c_out), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((window, c), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x_p, w)
    return out[:, :l]


# ---------------------------------------------------------------------------
# Banded-matmul dense conv1d (aligned-phase successor to the shifted-matmul
# kernel above)
# ---------------------------------------------------------------------------
#
# The shifted-matmul kernel loses to XLA because every tap's VMEM read is
# sublane-misaligned (~2 VPU realign passes per tap, docs/PERF.md).  This
# formulation removes per-tap shifts entirely: with the signal viewed as
# 8-row groups ([L/8, 8C]), output rows 8g..8g+7 need window rows
# 8g..8g+8+span-1, and the whole K-tap conv for a group is ONE matmul
#   out[g] = window(g) [1, W8*C] @ W_band [W8*C, 8*Cout]
# where W_band is the kernel scattered onto a banded block matrix.  Per
# tile that is Q = W8/8 matmuls with 1024/2048-wide contractions (MXU
# sweet spot) and only Q-1 misaligned row-slices (vs 2K VPU passes
# before).  The cost is bandwidth-free wasted FLOPs — W8/K per output —
# so the kernel is only used where W8/K is small (K=7: 16/7, K=11: 24/11);
# K=3 stays on XLA.  Dilated convs fold to dense first via the exact
# residue-stream decomposition (nn/layers._dilated_conv1d_decomposed).


def _banded_conv_kernel(x_hbm, wb_ref, out_ref, x_scr, sem, *, q_groups,
                        tile8):
    b = pl.program_id(0)
    i = pl.program_id(1)
    # window rounded to tile8 + 8 rows (sublane-aligned DMA size)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * tile8, tile8 + 8), :], x_scr, sem,
    )
    dma.start()
    dma.wait()
    eight_c = x_scr.shape[-1]
    acc = jnp.zeros((tile8, out_ref.shape[-1]), dtype=jnp.float32)
    for q in range(q_groups):
        xq = x_scr[pl.ds(q, tile8), :]
        wq = wb_ref[pl.ds(q * eight_c, eight_c), :]
        acc += jnp.dot(xq, wq, preferred_element_type=jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def _banded_weight(w: jax.Array, q_groups: int) -> jax.Array:
    """w [K, C, Cout] -> W_band [(8*q_groups)*C, 8*Cout]:
    W_band[(j+tap)*C + c, j*Cout + o] = w[tap, c, o]."""
    k, c, c_out = w.shape
    w8 = 8 * q_groups
    wb = jnp.zeros((w8, 8, c, c_out), dtype=w.dtype)
    for j in range(8):
        for tap in range(k):
            wb = wb.at[j + tap, j].set(w[tap])
    return jnp.transpose(wb, (0, 2, 1, 3)).reshape(w8 * c, 8 * c_out)


@functools.partial(jax.jit, static_argnames=("interpret", "tile_l"))
def banded_conv1d_pallas(x: jax.Array, w: jax.Array,
                         interpret: bool = False,
                         tile_l: int = 2048) -> jax.Array:
    """Dense (dilation-1) 'same'-padded conv, NLC: x [B, L, C] * w
    [K, C, Cout] -> [B, L, Cout].  K odd; C and Cout multiples of 128."""
    b, l, c = x.shape
    k, _, c_out = w.shape
    span = k - 1
    pad_lo = span // 2
    q_groups = 1 + -(-span // 8)
    tile8 = tile_l // 8
    n_tiles = -(-l // tile_l)
    # rows available must cover the last tile's window: the DMA reads
    # tile8 + 8 view-rows = tile_l + 64 samples past each tile start
    lp = (n_tiles * tile_l) + 64
    x_p = jnp.pad(x, ((0, 0), (pad_lo, lp - l - pad_lo), (0, 0)))
    x_r = x_p.reshape(b, lp // 8, 8 * c)

    co_tile = c_out if c_out <= 128 else 128
    n_co = c_out // co_tile
    kern = functools.partial(_banded_conv_kernel, q_groups=q_groups,
                             tile8=tile8)
    wb = _banded_weight(w, q_groups)            # [(8Q)*C, 8*Cout]
    out = pl.pallas_call(
        kern,
        grid=(b, n_tiles, n_co),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((8 * q_groups * c, 8 * co_tile),
                         lambda bi, i, co: (0, co), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile8, 8 * co_tile),
                               lambda bi, i, co: (bi, i, co),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * tile8, 8 * c_out),
                                       x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile8 + 8, 8 * c), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_r, wb)
    # [B, tiles*tile8, 8*Cout] -> [B, tiles*tile_l, Cout] -> trim
    out = out.reshape(b, n_tiles * tile_l, c_out)
    return out[:, :l]


def banded_conv_supported(k: int, c: int, c_out: int, l: int,
                          dtype_size: int = 2) -> bool:
    """Shape gate: contraction/output tiling plus a VMEM budget for the
    banded weight block, and a waste bound (W8/K <= 3) so only shapes that
    beat XLA's conv emitter route here (K=3's 5.3x waste loses)."""
    if k < 5 or k % 2 == 0 or c % 128 or c_out % 128 or l < 4096:
        return False
    span = k - 1
    q = 1 + -(-span // 8)
    if (8 * q) / k > 3.0:
        return False
    co_tile = min(c_out, 128)
    wb_bytes = (8 * q * c) * (8 * co_tile) * dtype_size
    return wb_bytes <= 10 * 1024 * 1024


def use_banded_conv() -> bool:
    """Opt-IN via MLX_AUDIO_TPU_BANDED_CONV=1 (TPU only).

    Measured on a v5e chip (scripts/bench_conv.py, docs/PERF.md): the
    banded kernel reaches 10.6-19 TFLOP/s on the resblock shapes vs
    XLA's 18.6-28.7 — the aligned-phase formulation removes the sublane
    realignment of the shifted-matmul kernel but Pallas DMA streaming on
    this stack caps near ~120 G elem/s (see probe_depth.py), so XLA's
    conv emitter keeps the win.  Kept as an A/B lever for other stacks."""
    if not _HAS_PALLAS or _env_on("MLX_AUDIO_TPU_NO_PALLAS"):
        return False
    if not _env_on("MLX_AUDIO_TPU_BANDED_CONV"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def use_pallas_conv() -> bool:
    """Opt-in only (MLX_AUDIO_TPU_PALLAS_CONV=1): measured 33 TFLOP/s vs
    XLA's ~45-52 on the ISTFTNet resblock shapes — the unaligned shifted
    VMEM reads cost ~2 VPU passes per tap (docs/PERF.md).  Kept as the
    starting point for a future aligned-phase variant."""
    if not _HAS_PALLAS or _env_on("MLX_AUDIO_TPU_NO_PALLAS"):
        return False
    if not _env_on("MLX_AUDIO_TPU_PALLAS_CONV"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False
