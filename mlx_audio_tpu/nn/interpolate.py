"""PyTorch-compatible 1-D interpolation as pure gathers (XLA-friendly).

Capability parity with the reference's tts/models/interpolate.py:6-108
(nearest / linear, optional align_corners), operating on NLC input
[batch, length, channels] per this package's layout convention.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def interpolate1d(
    x: jax.Array,
    size: int,
    mode: str = "nearest",
    align_corners: Optional[bool] = None,
) -> jax.Array:
    """x: [B, L, C] -> [B, size, C]."""
    in_width = x.shape[-2]
    size = max(1, int(size))

    if mode == "nearest":
        if size == 1:
            idx = np.zeros(1, dtype=np.int32)
        else:
            scale = in_width / size
            idx = np.clip(
                np.floor(np.arange(size) * scale).astype(np.int32), 0, in_width - 1
            )
        return jnp.take(x, jnp.asarray(idx), axis=-2)

    if mode != "linear":
        raise ValueError(f"unsupported mode {mode}")

    if in_width == 1:
        return jnp.broadcast_to(x, (*x.shape[:-2], size, x.shape[-1]))

    if align_corners and size > 1:
        pos = np.arange(size) * ((in_width - 1) / (size - 1))
    elif size == 1:
        pos = np.array([0.0])
    else:
        pos = np.arange(size) * (in_width / size)
        if not align_corners:
            pos = pos + 0.5 * (in_width / size) - 0.5

    lo = np.floor(pos).astype(np.int32)
    hi = np.minimum(lo + 1, in_width - 1)
    frac = (pos - lo).astype(np.float32)
    # Negative lo (from the -0.5 shift) mirrors the reference's direct
    # indexing, which wraps in numpy/MLX; clamp instead for well-defined
    # behavior at the boundary — values there have frac<0 weighting y_lo
    # beyond 1.0, matching torch's edge handling after the clamp.
    lo_idx = np.clip(lo, 0, in_width - 1)
    y_lo = jnp.take(x, jnp.asarray(lo_idx), axis=-2)
    y_hi = jnp.take(x, jnp.asarray(hi), axis=-2)
    frac = jnp.asarray(frac)[..., :, None]
    return y_lo * (1 - frac) + y_hi * frac


def interpolate(
    x: jax.Array,
    size: Optional[int] = None,
    scale_factor: Optional[float] = None,
    mode: str = "nearest",
    align_corners: Optional[bool] = None,
) -> jax.Array:
    """Resize the time axis of [B, L, C] input by size or scale factor."""
    if (size is None) == (scale_factor is None):
        raise ValueError("exactly one of size / scale_factor must be given")
    if size is None:
        val = x.shape[-2] * scale_factor
        # epsilon-tolerant ceil: 300000 * (1/300) must give 1000, not 1001
        size = max(1, int(np.ceil(val - 1e-6)))
    return interpolate1d(x, size, mode, align_corners)
