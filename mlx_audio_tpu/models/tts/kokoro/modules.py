"""Kokoro text encoder and prosody predictor (StyleTTS2 lineage).

Capability parity with /root/reference/mlx_audio/tts/models/kokoro/
modules.py:21-411, redesigned for TPU:

* NLC layout, batched (the reference's DurationEncoder assumes B=1).
* BiLSTMs are `lax.scan` (not per-step Python loops) with masked-flip
  backward passes so padded buckets give exact results.
* All mask applications mirror the reference's `mx.where(m, 0, x)` points.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mlx_audio_tpu.nn import (
    LSTM,
    AdaLayerNorm,
    Conv1d,
    Embedding,
    LayerNorm,
    Linear,
    Module,
    WNConv1d,
    leaky_relu,
)
from mlx_audio_tpu.models.tts.kokoro.istftnet import AdainResBlk1d


class TextEncoder(Module):
    """Embedding -> depth x (WN-conv, LN, LeakyReLU) -> BiLSTM
    (reference modules.py:21-68)."""

    def __init__(self, channels: int, kernel_size: int, depth: int, n_symbols: int):
        self.embedding = Embedding(n_symbols, channels)
        padding = (kernel_size - 1) // 2
        self.cnn = [
            [
                WNConv1d(channels, channels, kernel_size, padding=padding),
                LayerNorm(channels),
            ]
            for _ in range(depth)
        ]
        self.lstm = LSTM(channels, channels // 2)

    def __call__(self, input_ids: jax.Array, lengths: jax.Array,
                 pad_mask: jax.Array) -> jax.Array:
        """input_ids: [B, N]; pad_mask: [B, N] True = padding."""
        keep = ~pad_mask
        x = self.embedding(input_ids)
        x = jnp.where(keep[..., None], x, 0.0)
        for conv, norm in self.cnn:
            x = conv(x)
            x = jnp.where(keep[..., None], x, 0.0)
            x = norm(x)
            x = jnp.where(keep[..., None], x, 0.0)
            x = leaky_relu(x, 0.2)
            x = jnp.where(keep[..., None], x, 0.0)
        x, _ = self.lstm(x, lengths=lengths)
        return jnp.where(keep[..., None], x, 0.0)


class DurationEncoder(Module):
    """Alternating (BiLSTM, AdaLayerNorm) stack over style-concatenated
    features (reference modules.py:380-411, generalized to B>1)."""

    def __init__(self, sty_dim: int, d_model: int, nlayers: int, dropout: float = 0.1):
        self.lstms = []
        for _ in range(nlayers):
            self.lstms.append(LSTM(d_model + sty_dim, d_model // 2))
            self.lstms.append(AdaLayerNorm(sty_dim, d_model))
        self.d_model = d_model
        self.sty_dim = sty_dim

    def __call__(self, x: jax.Array, style: jax.Array, lengths: jax.Array,
                 pad_mask: jax.Array) -> jax.Array:
        """x: [B, N, C]; style: [B, S]; returns [B, N, C + S]."""
        keep = (~pad_mask)[..., None]
        s = jnp.broadcast_to(style[:, None, :], (*x.shape[:2], style.shape[-1]))
        x = jnp.concatenate([x, s], axis=-1)
        x = jnp.where(keep, x, 0.0)
        for block in self.lstms:
            if isinstance(block, AdaLayerNorm):
                x = block(x, style)
                x = jnp.concatenate([x, s], axis=-1)
                x = jnp.where(keep, x, 0.0)
            else:
                x, _ = block(x, lengths=lengths)
        return x


class ProsodyPredictor(Module):
    """Duration + F0/energy prediction (reference modules.py:288-377)."""

    def __init__(self, style_dim: int, d_hid: int, nlayers: int,
                 max_dur: int = 50, dropout: float = 0.1):
        self.text_encoder = DurationEncoder(
            sty_dim=style_dim, d_model=d_hid, nlayers=nlayers, dropout=dropout
        )
        self.lstm = LSTM(d_hid + style_dim, d_hid // 2)
        self.duration_proj = Linear(d_hid, max_dur)
        self.shared = LSTM(d_hid + style_dim, d_hid // 2)
        self.F0 = [
            AdainResBlk1d(d_hid, d_hid, style_dim),
            AdainResBlk1d(d_hid, d_hid // 2, style_dim, upsample=True),
            AdainResBlk1d(d_hid // 2, d_hid // 2, style_dim),
        ]
        self.N = [
            AdainResBlk1d(d_hid, d_hid, style_dim),
            AdainResBlk1d(d_hid, d_hid // 2, style_dim, upsample=True),
            AdainResBlk1d(d_hid // 2, d_hid // 2, style_dim),
        ]
        self.F0_proj = Conv1d(d_hid // 2, 1, 1, padding=0)
        self.N_proj = Conv1d(d_hid // 2, 1, 1, padding=0)

    def predict_durations(self, d: jax.Array, lengths: jax.Array) -> jax.Array:
        """d: [B, N, d_hid + style] -> raw duration logits [B, N, max_dur]."""
        x, _ = self.lstm(d, lengths=lengths)
        return self.duration_proj(x)

    def F0Ntrain(self, en: jax.Array, s: jax.Array,
                 frame_lengths: Optional[jax.Array] = None):
        """en: [B, F, d_hid + style] -> (F0 [B, 2F], N [B, 2F])."""
        x, _ = self.shared(en, lengths=frame_lengths)
        mask = (
            jnp.arange(x.shape[1])[None, :] < frame_lengths[:, None]
            if frame_lengths is not None else None
        )
        f0 = x
        for block in self.F0:
            f0 = block(f0, s, mask)
            if block.do_upsample and mask is not None:
                mask = jnp.repeat(mask, 2, axis=-1)
        f0 = self.F0_proj(f0)

        mask_n = (
            jnp.arange(x.shape[1])[None, :] < frame_lengths[:, None]
            if frame_lengths is not None else None
        )
        n = x
        for block in self.N:
            n = block(n, s, mask_n)
            if block.do_upsample and mask_n is not None:
                mask_n = jnp.repeat(mask_n, 2, axis=-1)
        n = self.N_proj(n)
        return f0[..., 0], n[..., 0]
