"""Parity tests for the blocks library against torch (CPU) semantics.

The reference validated its ports against PyTorch manually (SURVEY.md §4);
we make that validation executable: every conv / norm / LSTM / interpolate
block is checked against the torch op it must reproduce.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import mlx_audio_tpu.nn as tnn
from mlx_audio_tpu.nn.module import update_arrays


def t2n(t):
    return t.detach().numpy()


@pytest.mark.parametrize(
    "cin,cout,k,stride,pad,dil,groups",
    [(8, 16, 3, 1, 1, 1, 1), (8, 16, 5, 2, 2, 1, 1), (8, 8, 3, 1, 2, 2, 1),
     (8, 8, 3, 1, 1, 1, 8), (4, 12, 7, 3, 3, 1, 1), (6, 6, 1, 1, 0, 1, 1)],
)
def test_conv1d_matches_torch(cin, cout, k, stride, pad, dil, groups):
    torch.manual_seed(0)
    tc = torch.nn.Conv1d(cin, cout, k, stride=stride, padding=pad,
                         dilation=dil, groups=groups)
    x = torch.randn(2, cin, 50)
    ref = t2n(tc(x)).transpose(0, 2, 1)  # -> NLC

    ours = tnn.Conv1d(cin, cout, k, stride=stride, padding=pad,
                      dilation=dil, groups=groups)
    # torch weight [out, in/groups, k] -> ours [k, in/groups, out]
    ours = update_arrays(ours, {
        "weight": jnp.asarray(t2n(tc.weight).transpose(2, 1, 0)),
        "bias": jnp.asarray(t2n(tc.bias)),
    })
    out = np.asarray(ours(jnp.asarray(t2n(x).transpose(0, 2, 1))))
    np.testing.assert_allclose(out, ref, atol=1e-5)


@pytest.mark.parametrize(
    "cin,cout,k,stride,pad,outpad",
    [(8, 16, 4, 2, 1, 0), (8, 4, 3, 1, 1, 0), (6, 6, 20, 10, 5, 0),
     (8, 16, 4, 2, 1, 1)],
)
def test_conv_transpose1d_matches_torch(cin, cout, k, stride, pad, outpad):
    torch.manual_seed(1)
    tc = torch.nn.ConvTranspose1d(cin, cout, k, stride=stride, padding=pad,
                                  output_padding=outpad)
    x = torch.randn(2, cin, 30)
    ref = t2n(tc(x)).transpose(0, 2, 1)

    ours = tnn.ConvTranspose1d(cin, cout, k, stride=stride, padding=pad,
                               output_padding=outpad)
    # torch weight [in, out, k] -> ours [k, in, out]
    ours = update_arrays(ours, {
        "weight": jnp.asarray(t2n(tc.weight).transpose(2, 0, 1)),
        "bias": jnp.asarray(t2n(tc.bias)),
    })
    out = np.asarray(ours(jnp.asarray(t2n(x).transpose(0, 2, 1))))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_depthwise_conv_transpose1d_matches_torch():
    c, k, stride, pad = 8, 3, 2, 1
    torch.manual_seed(2)
    tc = torch.nn.ConvTranspose1d(c, c, k, stride=stride, padding=pad, groups=c)
    x = torch.randn(2, c, 25)
    ref = t2n(tc(x)).transpose(0, 2, 1)

    ours = tnn.ConvTranspose1d(c, c, k, stride=stride, padding=pad, groups=c)
    # torch weight [in=c, out/groups=1, k] -> ours [k, c, 1]
    ours = update_arrays(ours, {
        "weight": jnp.asarray(t2n(tc.weight).transpose(2, 0, 1)),
        "bias": jnp.asarray(t2n(tc.bias)),
    })
    out = np.asarray(ours(jnp.asarray(t2n(x).transpose(0, 2, 1))))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_weight_norm_conv_matches_torch():
    cin, cout, k = 8, 16, 3
    torch.manual_seed(3)
    tc = torch.nn.utils.weight_norm(torch.nn.Conv1d(cin, cout, k, padding=1))
    x = torch.randn(2, cin, 40)
    ref = t2n(tc(x)).transpose(0, 2, 1)

    ours = tnn.WNConv1d(cin, cout, k, padding=1)
    ours = update_arrays(ours, {
        "weight_v": jnp.asarray(t2n(tc.weight_v).transpose(2, 1, 0)),
        "weight_g": jnp.asarray(t2n(tc.weight_g).transpose(2, 1, 0)),
        "bias": jnp.asarray(t2n(tc.bias)),
    })
    out = np.asarray(ours(jnp.asarray(t2n(x).transpose(0, 2, 1))))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_weight_norm_conv_transpose_matches_torch():
    cin, cout, k, stride = 16, 8, 4, 2
    torch.manual_seed(4)
    tc = torch.nn.utils.weight_norm(
        torch.nn.ConvTranspose1d(cin, cout, k, stride=stride, padding=1)
    )
    x = torch.randn(2, cin, 20)
    ref = t2n(tc(x)).transpose(0, 2, 1)

    ours = tnn.WNConvTranspose1d(cin, cout, k, stride=stride, padding=1)
    ours = update_arrays(ours, {
        # torch convT weight [in, out, k]; v -> [k, in, out]; g [in, 1, 1] -> [1, in, 1]
        "weight_v": jnp.asarray(t2n(tc.weight_v).transpose(2, 0, 1)),
        "weight_g": jnp.asarray(t2n(tc.weight_g).transpose(1, 0, 2)),
        "bias": jnp.asarray(t2n(tc.bias)),
    })
    out = np.asarray(ours(jnp.asarray(t2n(x).transpose(0, 2, 1))))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_lstm_matches_torch():
    din, h = 12, 8
    torch.manual_seed(5)
    tl = torch.nn.LSTM(din, h, batch_first=True, bidirectional=True)
    x = torch.randn(3, 17, din)
    ref, _ = tl(x)

    ours = tnn.LSTM(din, h)
    ours = update_arrays(ours, {
        "Wx_forward": jnp.asarray(t2n(tl.weight_ih_l0)),
        "Wh_forward": jnp.asarray(t2n(tl.weight_hh_l0)),
        "bias_ih_forward": jnp.asarray(t2n(tl.bias_ih_l0)),
        "bias_hh_forward": jnp.asarray(t2n(tl.bias_hh_l0)),
        "Wx_backward": jnp.asarray(t2n(tl.weight_ih_l0_reverse)),
        "Wh_backward": jnp.asarray(t2n(tl.weight_hh_l0_reverse)),
        "bias_ih_backward": jnp.asarray(t2n(tl.bias_ih_l0_reverse)),
        "bias_hh_backward": jnp.asarray(t2n(tl.bias_hh_l0_reverse)),
    })
    out, _ = ours(jnp.asarray(t2n(x)))
    np.testing.assert_allclose(np.asarray(out), t2n(ref), atol=1e-5)


def test_instance_norm_matches_torch():
    c = 8
    tc = torch.nn.InstanceNorm1d(c)
    x = torch.randn(2, c, 33)
    ref = t2n(tc(x)).transpose(0, 2, 1)
    ours = tnn.InstanceNorm1d(c)
    out = np.asarray(ours(jnp.asarray(t2n(x).transpose(0, 2, 1))))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_layer_norm_matches_torch():
    torch.manual_seed(6)
    tc = torch.nn.LayerNorm(16)
    x = torch.randn(2, 9, 16)
    ref = t2n(tc(x))
    ours = tnn.LayerNorm(16)
    ours = update_arrays(ours, {
        "weight": jnp.asarray(t2n(tc.weight)), "bias": jnp.asarray(t2n(tc.bias)),
    })
    out = np.asarray(ours(jnp.asarray(t2n(x))))
    np.testing.assert_allclose(out, ref, atol=1e-5)


@pytest.mark.parametrize("mode,align", [("nearest", None), ("linear", False), ("linear", True)])
@pytest.mark.parametrize("size", [7, 20, 45])
def test_interpolate_matches_torch(mode, align, size):
    torch.manual_seed(7)
    x = torch.randn(2, 4, 15)
    kwargs = {} if mode == "nearest" else {"align_corners": align}
    ref = t2n(torch.nn.functional.interpolate(x, size=size, mode=mode, **kwargs))
    out = np.asarray(
        tnn.interpolate1d(jnp.asarray(t2n(x).transpose(0, 2, 1)), size, mode, align)
    ).transpose(0, 2, 1)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_sdpa_matches_torch():
    torch.manual_seed(8)
    q = torch.randn(2, 4, 10, 16)
    k = torch.randn(2, 4, 12, 16)
    v = torch.randn(2, 4, 12, 16)
    ref = t2n(torch.nn.functional.scaled_dot_product_attention(q, k, v))
    out = np.asarray(tnn.scaled_dot_product_attention(
        jnp.asarray(t2n(q)), jnp.asarray(t2n(k)), jnp.asarray(t2n(v))))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_gqa_broadcast():
    q = jnp.ones((1, 8, 4, 16))
    k = jnp.ones((1, 2, 4, 16))
    v = jnp.ones((1, 2, 4, 16))
    out = tnn.scaled_dot_product_attention(q, k, v)
    assert out.shape == (1, 8, 4, 16)


def test_kv_cache_decode_equals_full_attention():
    import jax

    b, h, d, steps = 1, 2, 8, 5
    rng = np.random.default_rng(0)
    qs = jnp.asarray(rng.standard_normal((b, h, steps, d)), dtype=jnp.float32)
    ks = jnp.asarray(rng.standard_normal((b, h, steps, d)), dtype=jnp.float32)
    vs = jnp.asarray(rng.standard_normal((b, h, steps, d)), dtype=jnp.float32)

    full = tnn.scaled_dot_product_attention(qs, ks, vs, tnn.causal_mask(steps))

    cache = tnn.KVCache.create(b, h, 16, d)
    outs = []
    for t in range(steps):
        out, cache = tnn.cached_attention(
            qs[:, :, t : t + 1], ks[:, :, t : t + 1], vs[:, :, t : t + 1], cache
        )
        outs.append(out)
    step_out = jnp.concatenate(outs, axis=2)
    np.testing.assert_allclose(np.asarray(step_out), np.asarray(full), atol=1e-5)


def test_rope_matches_hf_llama():
    # Independent reference: HF-style rotate_half implementation in numpy.
    d, l = 16, 10
    cos, sin = tnn.rope_table(d, 32)
    x = np.random.default_rng(1).standard_normal((1, 2, l, d)).astype(np.float32)
    c = np.asarray(cos)[:l][None, None]
    s = np.asarray(sin)[:l][None, None]
    cc = np.concatenate([c, c], axis=-1)
    ss = np.concatenate([s, s], axis=-1)
    rot = np.concatenate([-x[..., d // 2 :], x[..., : d // 2]], axis=-1)
    ref = x * cc + rot * ss
    out = np.asarray(tnn.apply_rope(jnp.asarray(x), cos, sin))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_snake():
    x = jnp.linspace(-2, 2, 64).reshape(1, 8, 8)
    a = jnp.full((8,), 0.5)
    out = np.asarray(tnn.snake(x, a))
    ref = np.asarray(x) + np.sin(0.5 * np.asarray(x)) ** 2 / 0.5
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_lstm_final_states_exact_under_padding():
    """Final (h, c) must reflect each row's last VALID step, not the padded
    tail (states from padded steps are polluted by bias-only gate inputs)."""
    import jax.numpy as jnp
    from mlx_audio_tpu.nn.recurrent import LSTM

    rng = np.random.default_rng(0)
    lstm = LSTM(8, 16, bidirectional=True)
    x_full = jnp.asarray(rng.standard_normal((2, 10, 8)) * 0.5,
                         dtype=jnp.float32)
    lengths = jnp.asarray([10, 6])

    out, ((hf, cf), (hb, cb)) = lstm(x_full, lengths=lengths)
    # reference: run row 1's valid prefix alone (no padding)
    out1, ((hf1, cf1), (hb1, cb1)) = lstm(x_full[1:2, :6])
    np.testing.assert_allclose(np.asarray(hf[1]), np.asarray(hf1[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(cf[1]), np.asarray(cf1[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(hb[1]), np.asarray(hb1[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(cb[1]), np.asarray(cb1[0]),
                               atol=1e-5)


def test_gqa_attention_matches_repeated_kv():
    """Grouped-query einsum path == explicit K/V repetition."""
    import jax.numpy as jnp
    from mlx_audio_tpu.nn.attention import scaled_dot_product_attention

    rng = np.random.default_rng(1)
    b, hq, hkv, lq, lk, d = 2, 8, 2, 5, 7, 16
    q = jnp.asarray(rng.standard_normal((b, hq, lq, d)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, lk, d)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, lk, d)), dtype=jnp.float32)
    mask = jnp.where(
        np.random.default_rng(2).random((b, 1, lq, lk)) > 0.3, 0.0, -1e9
    ).astype(jnp.float32)
    out = scaled_dot_product_attention(q, k, v, mask)
    rep = hq // hkv
    ref = scaled_dot_product_attention(
        q, jnp.repeat(k, rep, axis=1), jnp.repeat(v, rep, axis=1), mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_apply_rope_batched_positions():
    """2-D positions must rotate per sample, aligned on the batch axis."""
    import jax.numpy as jnp
    from mlx_audio_tpu.nn.attention import apply_rope, rope_table

    cos, sin = rope_table(8, 32)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 4, 3, 8)), dtype=jnp.float32)
    pos = jnp.asarray([[0, 1, 2], [5, 6, 7]])
    out = apply_rope(x, cos, sin, pos)
    # per-sample reference with 1-D positions
    for bidx in range(2):
        ref = apply_rope(x[bidx:bidx + 1], cos, sin, pos[bidx])
        np.testing.assert_allclose(np.asarray(out[bidx:bidx + 1]),
                                   np.asarray(ref), atol=1e-6)


def test_dilated_conv_decomposition_exact():
    """The residue-stream dilation decomposition (opt-in fast path for long
    'same'-padded dilated convs) must be bit-exact vs the direct dilated
    conv, including both zero-padded boundaries and lengths not divisible
    by the dilation."""
    import numpy as np

    from mlx_audio_tpu.nn.layers import _dilated_conv1d_decomposed, conv1d

    rng = np.random.default_rng(0)
    for (l, c, k, d) in [(301, 8, 3, 3), (1024, 16, 7, 5), (77, 4, 11, 3),
                         (50, 4, 3, 5)]:
        x = jnp.asarray(rng.standard_normal((2, l, c)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, c, c)) * 0.1, jnp.float32)
        pad = (k - 1) * d // 2
        ref = conv1d(x, w, padding=pad, dilation=d)
        got = _dilated_conv1d_decomposed(x, w, d)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)
