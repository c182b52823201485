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
    hs, cs, (hT, cT) = lstm_pallas(xp, wh.T, h0, c0, interpret=True)
    if reverse:
        hs = jnp.flip(hs, axis=1)

    np.testing.assert_allclose(np.asarray(hs), np.asarray(hs_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hT), np.asarray(hT_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cT), np.asarray(cT_ref), atol=1e-5)
    # per-step cells: the final one must equal the final cell state
    cs_last = cs[:, -1] if not reverse else cs[:, -1]
    np.testing.assert_allclose(np.asarray(cs_last), np.asarray(cT),
                               atol=1e-6)


@pytest.mark.skipif(not _HAS_PALLAS, reason="pallas unavailable")
@pytest.mark.parametrize("bits", [8, 4])
def test_quantized_matmul_matches_dense_dequant(bits):
    """Fused dequant-matmul == dequantize-then-matmul (the XLA path)."""
    from mlx_audio_tpu.nn.layers import Linear
    from mlx_audio_tpu.nn.pallas_ops import quantized_matmul
    from mlx_audio_tpu.nn.quantize import QuantizedLinear

    rng = np.random.default_rng(1)
    b, i, o = 4, 256, 384
    lin = Linear(i, o, bias=False)
    lin.weight = jnp.asarray(rng.standard_normal((o, i)) * 0.2,
                             dtype=jnp.float32)
    q = QuantizedLinear.from_linear(lin, group_size=64, bits=bits)

    # bits<=4 store packed nibble codes (two per byte, half the bytes)
    assert q.weight.shape[1] == (i // 2 if bits <= 4 else i)
    x = jnp.asarray(rng.standard_normal((b, i)) * 0.5, dtype=jnp.float32)
    ref = x @ q._dequant(jnp.float32).T
    out = quantized_matmul(x, q.weight, q.scales, q.biases, 64,
                           packed=q.packed, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(not _HAS_PALLAS, reason="pallas unavailable")
def test_quantized_matmul_bf16_activations():
    from mlx_audio_tpu.nn.layers import Linear
    from mlx_audio_tpu.nn.pallas_ops import quantized_matmul
    from mlx_audio_tpu.nn.quantize import QuantizedLinear

    rng = np.random.default_rng(2)
    b, i, o = 2, 128, 128
    lin = Linear(i, o, bias=False)
    lin.weight = jnp.asarray(rng.standard_normal((o, i)) * 0.2,
                             dtype=jnp.float32)
    q = QuantizedLinear.from_linear(lin, group_size=64, bits=8)
    x = jnp.asarray(rng.standard_normal((b, i)) * 0.5, dtype=jnp.bfloat16)
    ref = (x.astype(jnp.float32) @ q._dequant(jnp.float32).T)
    out = quantized_matmul(x, q.weight, q.scales, q.biases, 64,
                           interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(ref), rtol=2e-2, atol=2e-2)


@pytest.mark.skipif(not _HAS_PALLAS, reason="pallas unavailable")
@pytest.mark.parametrize("k,dilation", [(3, 1), (7, 3), (11, 5)])
def test_dilated_conv_pallas_matches_xla(k, dilation):
    """Shifted-matmul dilated conv == conv_general_dilated ('same' pad)."""
    from mlx_audio_tpu.nn.layers import conv1d, get_padding
    from mlx_audio_tpu.nn.pallas_ops import dilated_conv1d_pallas

    rng = np.random.default_rng(0)
    b, l, c, c_out = 2, 1111, 128, 128   # L not a tile multiple on purpose
    x = jnp.asarray(rng.standard_normal((b, l, c)) * 0.3, dtype=jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, c, c_out)) * 0.1,
                    dtype=jnp.float32)
    ref = conv1d(x, w, padding=get_padding(k, dilation), dilation=dilation)
    out = dilated_conv1d_pallas(x, w, dilation, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,c,c_out", [(7, 128, 128), (11, 128, 128),
                                       (7, 256, 256), (11, 128, 256)])
def test_banded_conv_matches_xla(k, c, c_out):
    from mlx_audio_tpu.nn.pallas_ops import banded_conv1d_pallas

    rng = np.random.default_rng(k + c)
    x = jnp.asarray(rng.standard_normal((2, 4096 + 37, c)) * 0.1,
                    dtype=jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, c, c_out)) * 0.05,
                    dtype=jnp.float32)
    pad = (k - 1) // 2
    ref = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=((pad, pad),),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    out = banded_conv1d_pallas(x, w, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("dilation", [3, 5])
def test_banded_dilated_residue_matches_xla(dilation):
    from functools import partial

    from mlx_audio_tpu.nn.layers import _dilated_conv1d_residue
    from mlx_audio_tpu.nn.pallas_ops import banded_conv1d_pallas

    k, c = 7, 128
    rng = np.random.default_rng(dilation)
    x = jnp.asarray(rng.standard_normal((1, 9000, c)) * 0.1,
                    dtype=jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, c, c)) * 0.05, dtype=jnp.float32)
    pad = (k - 1) * dilation // 2
    ref = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=((pad, pad),),
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    out = _dilated_conv1d_residue(
        x, w, dilation, partial(banded_conv1d_pallas, interpret=True)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_banded_conv_supported_gate():
    from mlx_audio_tpu.nn.pallas_ops import banded_conv_supported

    assert banded_conv_supported(7, 128, 128, 78000)
    assert banded_conv_supported(11, 128, 128, 78000)
    assert not banded_conv_supported(3, 128, 128, 78000)   # 5.3x waste
    assert not banded_conv_supported(7, 64, 128, 78000)    # contraction tile
    assert not banded_conv_supported(7, 128, 128, 1000)    # too short
