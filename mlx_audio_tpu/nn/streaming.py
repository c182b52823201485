"""Streaming causal convolutions with functional carry state.

The reference keeps mutable ``_prev_xs``/``_prev_ys`` buffers inside each
conv (codec/models/mimi/modules/conv.py:210-351).  Under XLA those become
explicit fixed-size carry pytrees threaded through `lax.scan` — statically
shaped, jit-able, and bit-identical to the batch path.

Conventions: NLC layout; streaming steps must feed chunk lengths that are
multiples of the conv stride (always true in codec pipelines, where each
codec frame maps to an exact sample count).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from mlx_audio_tpu.nn.module import Module
from mlx_audio_tpu.nn.layers import _uniform, conv1d, conv_transpose1d, depthwise_conv_transpose1d


class ConvState(NamedTuple):
    """Carry for a streaming causal conv: the trailing receptive-field tail."""

    buf: jax.Array    # [B, K_eff - S, C_in]
    first: jax.Array  # bool scalar — left pad not yet applied


class ConvTrState(NamedTuple):
    """Carry for a streaming transposed conv: the pending overlap tail."""

    buf: jax.Array  # [B, K - S, C_out] (bias-free partial sums)


class StreamableConv1d(Module):
    """Causal conv1d with batch and streaming step paths (cf. reference
    StreamableConv1d, conv.py:210-293).  Weight layout [k, in/groups, out]."""

    def __init__(self, in_channels: int, out_channels: int, ksize: int,
                 stride: int = 1, dilation: int = 1, groups: int = 1,
                 bias: bool = True, causal: bool = True,
                 pad_mode: str = "constant"):
        self.stride = stride
        self.dilation = dilation
        self.groups = groups
        self.causal = causal
        self.pad_mode = pad_mode
        self.ksize = ksize
        scale = 1.0 / (in_channels * ksize)
        self.weight = _uniform((ksize, in_channels // groups, out_channels), scale)
        self.bias = jnp.zeros((out_channels,)) if bias else None

    @property
    def effective_ksize(self) -> int:
        return (self.ksize - 1) * self.dilation + 1

    def _pad_input(self, x: jax.Array) -> jax.Array:
        k_eff = self.effective_ksize
        padding_total = k_eff - self.stride
        length = x.shape[-2]
        nframes = max(length + padding_total - k_eff, 0) / self.stride + 1.0
        ideal = (int(math.ceil(nframes)) - 1) * self.stride + k_eff - padding_total
        extra = max(0, ideal - length)
        if self.causal:
            left, right = padding_total, extra
        else:
            right = padding_total // 2
            left = padding_total - right
            right += extra
        cfg = [(0, 0)] * (x.ndim - 2) + [(left, right), (0, 0)]
        mode = "edge" if self.pad_mode == "edge" else "constant"
        return jnp.pad(x, cfg, mode=mode)

    def __call__(self, x: jax.Array) -> jax.Array:
        """[B, L, C_in] -> [B, ceil(L/S), C_out] with causal padding."""
        x = self._pad_input(x)
        y = conv1d(x, self.weight, self.stride, 0, self.dilation, self.groups)
        if self.bias is not None:
            y = y + self.bias
        return y

    # -- streaming ---------------------------------------------------------

    def init_state(self, batch: int, dtype=jnp.float32) -> ConvState:
        pad = self.effective_ksize - self.stride
        in_ch = self.weight.shape[1] * self.groups
        return ConvState(
            buf=jnp.zeros((batch, pad, in_ch), dtype=dtype),
            first=jnp.asarray(True),
        )

    def step(self, state: ConvState, x: jax.Array) -> tuple[jax.Array, ConvState]:
        """x: [B, L, C_in], L a multiple of stride -> ([B, L/S, C_out], state)."""
        pad = self.effective_ksize - self.stride
        if pad > 0:
            init = state.buf
            if self.pad_mode == "edge":
                edge = jnp.broadcast_to(x[:, :1, :], init.shape)
                init = jnp.where(state.first, edge, init)
            full = jnp.concatenate([init, x], axis=1)
        else:
            full = x
        y = conv1d(full, self.weight, self.stride, 0, self.dilation, self.groups)
        if self.bias is not None:
            y = y + self.bias
        new_buf = full[:, full.shape[1] - pad:] if pad > 0 else state.buf
        return y, ConvState(buf=new_buf, first=jnp.asarray(False))


class StreamableConvTranspose1d(Module):
    """Causal transposed conv with batch and streaming step paths (reference
    conv.py:296-351).  groups=1 (weight [k, in, out]) or depthwise
    (weight [k, C, 1])."""

    def __init__(self, in_channels: int, out_channels: int, ksize: int,
                 stride: int = 1, groups: int = 1, bias: bool = True,
                 causal: bool = True):
        self.stride = stride
        self.groups = groups
        self.causal = causal
        self.ksize = ksize
        self.out_channels = out_channels
        scale = 1.0 / (in_channels * ksize)
        if groups == 1:
            self.weight = _uniform((ksize, in_channels, out_channels), scale)
        else:
            if groups != in_channels or groups != out_channels:
                raise NotImplementedError("only depthwise grouped convT supported")
            self.weight = _uniform((ksize, in_channels, 1), scale)
        self.bias = jnp.zeros((out_channels,)) if bias else None

    def _convt(self, x: jax.Array) -> jax.Array:
        if self.groups == 1:
            return conv_transpose1d(x, self.weight, self.stride, padding=0)
        return depthwise_conv_transpose1d(x, self.weight, self.stride, padding=0)

    def __call__(self, x: jax.Array) -> jax.Array:
        """[B, L, C_in] -> [B, L*S, C_out] (causal unpad right)."""
        padding_total = max(self.ksize - self.stride, 0)
        y = self._convt(x)
        if self.bias is not None:
            y = y + self.bias
        if self.causal:
            return y[:, : y.shape[1] - padding_total]
        left = padding_total - padding_total // 2
        return y[:, left: y.shape[1] - padding_total // 2]

    # -- streaming ---------------------------------------------------------

    def init_state(self, batch: int, dtype=jnp.float32) -> ConvTrState:
        if self.ksize < self.stride:
            # "gappy" transposed conv: the batch path works, but exact
            # streaming needs an end-of-stream flush for the ragged tail —
            # unsupported rather than silently wrong (negative carry shapes)
            raise NotImplementedError(
                "streaming ConvTranspose1d requires ksize >= stride"
            )
        pad = self.ksize - self.stride
        return ConvTrState(buf=jnp.zeros((batch, pad, self.out_channels), dtype=dtype))

    def step(self, state: ConvTrState, x: jax.Array) -> tuple[jax.Array, ConvTrState]:
        """x: [B, L, C_in] -> ([B, L*S, C_out], state)."""
        pad = self.ksize - self.stride
        y = self._convt(x)  # [B, L*S + pad, C_out], bias-free
        if pad > 0:
            y = y.at[:, :pad].add(state.buf)
        emit_len = y.shape[1] - pad
        emit = y[:, :emit_len]
        if self.bias is not None:
            emit = emit + self.bias
        new_buf = y[:, emit_len:] if pad > 0 else state.buf
        return emit, ConvTrState(buf=new_buf)
