"""Pallas kernel parity (interpret mode on CPU) vs the lax.scan reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_tpu.nn.pallas_ops import _HAS_PALLAS, lstm_pallas
from mlx_audio_tpu.nn.recurrent import lstm_scan


@pytest.mark.skipif(not _HAS_PALLAS, reason="pallas unavailable")
@pytest.mark.parametrize("reverse", [False, True])
def test_lstm_pallas_matches_scan(reverse):
    rng = np.random.default_rng(0)
    b, t, h = 8, 12, 128
    x_proj = jnp.asarray(rng.standard_normal((b, t, 4 * h)) * 0.3,
                         dtype=jnp.float32)
    wh = jnp.asarray(rng.standard_normal((4 * h, h)) * 0.1, dtype=jnp.float32)
    h0 = jnp.zeros((b, h), dtype=jnp.float32)
    c0 = jnp.zeros((b, h), dtype=jnp.float32)

    hs_ref, (hT_ref, cT_ref) = lstm_scan(x_proj, wh, h0, c0, reverse=reverse)

    xp = jnp.flip(x_proj, axis=1) if reverse else x_proj
    hs, (hT, cT) = lstm_pallas(xp, wh.T, h0, c0, interpret=True)
    if reverse:
        hs = jnp.flip(hs, axis=1)

    np.testing.assert_allclose(np.asarray(hs), np.asarray(hs_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hT), np.asarray(hT_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cT), np.asarray(cT_ref), atol=1e-5)
