"""Recurrent blocks as `lax.scan` (TPU-compatible, fused, static-shaped).

The reference runs one Python iteration per timestep (kokoro/modules.py:
152-239, encodec.py:125-171) — fine for lazy MLX, fatal under XLA tracing.
Here the input projection is hoisted to a single big matmul (MXU) and the
recurrence is a `lax.scan` over precomputed gate activations.

Gate packing follows torch LSTM order (i, f, g, o) so checkpoints map 1:1.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.nn.module import Module
from mlx_audio_tpu.nn.layers import _uniform


def lstm_scan(
    x_proj: jax.Array,
    w_h: jax.Array,
    h0: jax.Array,
    c0: jax.Array,
    reverse: bool = False,
    return_cells: bool = False,
):
    """Run the LSTM recurrence.

    x_proj: [B, L, 4H] precomputed input gates (+ biases); w_h: [4H, H].
    Returns (hidden states [B, L, H], final (h, c)); with ``return_cells``,
    (hidden states, cell states [B, L, H], final (h, c)) — per-step cells
    let callers recover exact finals for padded rows.

    On TPU with tile-aligned shapes (B % 8 == 0, H % 128 == 0) the whole
    recurrence runs as one Pallas kernel (nn/pallas_ops.py): recurrent
    weight resident in VMEM, state carried in scratch across grid steps —
    no per-step scan dispatch.
    """
    from mlx_audio_tpu.nn.pallas_ops import lstm_pallas, use_pallas_lstm

    b, _, h4 = x_proj.shape
    h = h4 // 4
    if use_pallas_lstm() and x_proj.dtype == jnp.float32 and h % 128 == 0:
        pad_b = (-b) % 8  # f32 sublane tile is 8
        xp = jnp.flip(x_proj, axis=1) if reverse else x_proj
        if pad_b:
            xp = jnp.pad(xp, ((0, pad_b), (0, 0), (0, 0)))
            h0 = jnp.pad(h0, ((0, pad_b), (0, 0)))
            c0 = jnp.pad(c0, ((0, pad_b), (0, 0)))
        hs, cs, (hT, cT) = lstm_pallas(xp, w_h.T, h0, c0)
        if pad_b:
            hs, cs, hT, cT = hs[:b], cs[:b], hT[:b], cT[:b]
        if reverse:
            hs = jnp.flip(hs, axis=1)
            cs = jnp.flip(cs, axis=1)
        if return_cells:
            return hs, cs, (hT, cT)
        return hs, (hT, cT)

    w_h_t = w_h.T  # [H, 4H]

    def step(carry, xt):
        h, c = carry
        ifgo = xt + h @ w_h_t
        i, f, g, o = jnp.split(ifgo, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), (h, c)

    xs = jnp.swapaxes(x_proj, 0, 1)  # [L, B, 4H]
    (h, c), (hs, cs) = jax.lax.scan(step, (h0, c0), xs, reverse=reverse)
    hs = jnp.swapaxes(hs, 0, 1)
    if return_cells:
        return hs, jnp.swapaxes(cs, 0, 1), (h, c)
    return hs, (h, c)


def masked_flip(x: jax.Array, lengths: jax.Array) -> jax.Array:
    """Reverse each row's valid prefix: out[b, t] = x[b, len_b-1-t] (0 beyond).

    This makes bidirectional RNNs exact under padding-to-bucket: the backward
    pass must start at the last *valid* step, not the padded tail.
    """
    l = x.shape[1]
    idx = lengths[:, None] - 1 - jnp.arange(l)[None, :]
    valid = idx >= 0
    idx_c = jnp.clip(idx, 0, l - 1)
    out = jnp.take_along_axis(x, idx_c[..., None], axis=1)
    return jnp.where(valid[..., None], out, 0.0)


class LSTM(Module):
    """Single-layer (optionally bidirectional) LSTM over [B, L, D] input.

    Weight names mirror the reference's MLX port (kokoro/modules.py:111-144):
    ``Wx_forward`` [4H, D], ``Wh_forward`` [4H, H], ``bias_ih_forward``,
    ``bias_hh_forward`` and the ``_backward`` set, which themselves map 1:1
    from torch's ``weight_ih_l0``/``weight_hh_l0``/... keys.
    """

    def __init__(
        self,
        input_size: int,
        hidden_size: int,
        bias: bool = True,
        bidirectional: bool = True,
    ):
        self.input_size = input_size
        self.hidden_size = hidden_size
        self.bidirectional = bidirectional
        scale = 1.0 / math.sqrt(hidden_size)
        self.Wx_forward = _uniform((4 * hidden_size, input_size), scale)
        self.Wh_forward = _uniform((4 * hidden_size, hidden_size), scale)
        self.bias_ih_forward = _uniform((4 * hidden_size,), scale) if bias else None
        self.bias_hh_forward = _uniform((4 * hidden_size,), scale) if bias else None
        if bidirectional:
            self.Wx_backward = _uniform((4 * hidden_size, input_size), scale)
            self.Wh_backward = _uniform((4 * hidden_size, hidden_size), scale)
            self.bias_ih_backward = _uniform((4 * hidden_size,), scale) if bias else None
            self.bias_hh_backward = _uniform((4 * hidden_size,), scale) if bias else None

    def _run(self, x, wx, wh, b_ih, b_hh, reverse, return_cells=False):
        x_proj = x @ wx.T
        if b_ih is not None:
            x_proj = x_proj + b_ih + b_hh
        b = x.shape[0]
        h0 = jnp.zeros((b, self.hidden_size), dtype=x.dtype)
        c0 = jnp.zeros((b, self.hidden_size), dtype=x.dtype)
        return lstm_scan(x_proj, wh, h0, c0, reverse=reverse,
                         return_cells=return_cells)

    @staticmethod
    def _final_at(states, lengths):
        """Gather each row's state at its last valid step: [B, L, H] -> [B, H]."""
        idx = jnp.clip(lengths - 1, 0)[:, None, None]
        return jnp.take_along_axis(
            states, jnp.broadcast_to(idx, (states.shape[0], 1, states.shape[2])),
            axis=1,
        )[:, 0]

    def __call__(self, x: jax.Array, lengths: Optional[jax.Array] = None):
        """x: [B, L, D] (or [L, D]) -> ([B, L, H*dirs], final states).

        With ``lengths`` [B], the backward direction runs over each row's
        flipped valid prefix, making results exact for padded buckets.
        """
        squeeze = x.ndim == 2
        if squeeze:
            x = x[None]
        if lengths is None:
            fwd, (hf, cf) = self._run(
                x, self.Wx_forward, self.Wh_forward,
                self.bias_ih_forward, self.bias_hh_forward, reverse=False,
            )
        else:
            # final states must reflect each row's LAST VALID step, not the
            # padded tail — gather them from the per-step h/c trajectories
            fwd, cells_f, _ = self._run(
                x, self.Wx_forward, self.Wh_forward,
                self.bias_ih_forward, self.bias_hh_forward, reverse=False,
                return_cells=True,
            )
            hf = self._final_at(fwd, lengths)
            cf = self._final_at(cells_f, lengths)
        if not self.bidirectional:
            out = fwd
            state = (hf, cf)
        else:
            if lengths is None:
                bwd, (hb, cb) = self._run(
                    x, self.Wx_backward, self.Wh_backward,
                    self.bias_ih_backward, self.bias_hh_backward, reverse=True,
                )
            else:
                xr = masked_flip(x, lengths)
                bwd_r, cells_b, _ = self._run(
                    xr, self.Wx_backward, self.Wh_backward,
                    self.bias_ih_backward, self.bias_hh_backward,
                    reverse=False, return_cells=True,
                )
                bwd = masked_flip(bwd_r, lengths)
                hb = self._final_at(bwd_r, lengths)
                cb = self._final_at(cells_b, lengths)
            out = jnp.concatenate([fwd, bwd], axis=-1)
            state = ((hf, cf), (hb, cb))
        if squeeze:
            out = out[0]
        return out, state
