"""Golden numerical-parity tests against HF transformers' torch models.

The reference repo never tests numerics against its upstream sources
(SURVEY.md §4); these tests close that gap offline: build a tiny random-init
torch model from `transformers` (the same implementations the published
checkpoints are distributed in), convert its weights through our `sanitize`
path, and require allclose outputs / identical codes.  Passing here means a
real HF-format checkpoint loads and reproduces bit-comparable audio.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from mlx_audio_tpu.nn.module import update_arrays

RATIOS = [8, 6, 5, 4]


def build_mimi_pair(layer_scale=1.0):
    from transformers import MimiConfig as HFMimiConfig, MimiModel

    from mlx_audio_tpu.codec.mimi.mimi import Mimi, MimiConfig
    from mlx_audio_tpu.codec.mimi.seanet import SeanetConfig
    from mlx_audio_tpu.codec.mimi.transformer import TransformerConfig

    torch.manual_seed(0)
    hf = MimiModel(
        HFMimiConfig(
            sampling_rate=24000, frame_rate=12.5, audio_channels=1,
            hidden_size=32, num_filters=4, num_residual_layers=1,
            upsampling_ratios=RATIOS, codebook_size=16, codebook_dim=8,
            num_quantizers=4, intermediate_size=64, upsample_groups=32,
            num_hidden_layers=2, num_attention_heads=2,
            num_key_value_heads=2, head_dim=16, sliding_window=25,
            layer_scale_initial_scale=layer_scale,
            vector_quantization_hidden_dimension=8,
            num_semantic_quantizers=1,
        )
    ).eval()

    seanet = SeanetConfig(
        dimension=32, channels=1, causal=True, nfilters=4,
        nresidual_layers=1, ratios=RATIOS, ksize=7, residual_ksize=3,
        last_ksize=3, dilation_base=2, pad_mode="constant", true_skip=True,
        compress=2,
    )
    tf_cfg = TransformerConfig(
        d_model=32, num_heads=2, num_layers=2, causal=True, norm_first=True,
        bias_ff=False, bias_attn=False, layer_scale=layer_scale,
        positional_embedding="rope", use_conv_bias=True, gating=False,
        norm="layer_norm", context=25, max_period=10000, max_seq_len=8192,
        kv_repeat=1, dim_feedforward=64, conv_layout=True,
    )
    ours = Mimi(
        MimiConfig(
            channels=1, sample_rate=24000, frame_rate=12.5,
            renormalize=False, seanet=seanet, transformer=tf_cfg,
            quantizer_nq=4, quantizer_bins=16, quantizer_dim=8,
        )
    )
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    ours = update_arrays(ours, ours.sanitize(sd), strict=True)
    return hf, ours


def test_mimi_matches_hf_transformers():
    """Encode codes identical, decoded waveform allclose, stagewise parity
    (validates SEANet layouts, windowed-causal attention, the interleaved
    RoPE un-permutation, and split-RVQ semantics against the
    implementation the `kyutai/mimi` checkpoint ships in)."""
    hf, ours = build_mimi_pair()
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((1, 1, 1920 * 12)).astype(np.float32) * 0.1

    with torch.no_grad():
        h_hf = hf.encoder(torch.from_numpy(audio)).numpy()  # [B, C, L]
        t_hf = hf.encoder_transformer(
            torch.from_numpy(h_hf).transpose(1, 2)
        )[0].numpy()
        codes_hf = hf.encode(torch.from_numpy(audio)).audio_codes.numpy()
        wav_hf = hf.decode(torch.from_numpy(codes_hf)).audio_values.numpy()

    h_ours = np.asarray(ours.encoder(jnp.asarray(audio.transpose(0, 2, 1))))
    np.testing.assert_allclose(
        h_ours, h_hf.transpose(0, 2, 1), atol=1e-4, rtol=1e-4
    )
    t_ours = np.asarray(ours.encoder_transformer(jnp.asarray(h_ours))[0])
    np.testing.assert_allclose(t_ours, t_hf, atol=1e-4, rtol=1e-4)

    codes_ours = np.asarray(ours.encode(jnp.asarray(audio)))
    assert codes_ours.shape == codes_hf.shape
    assert (codes_ours == codes_hf).all()

    wav_ours = np.asarray(ours.decode(jnp.asarray(codes_hf)))
    np.testing.assert_allclose(
        wav_ours[..., : wav_hf.shape[-1]], wav_hf, atol=1e-4, rtol=1e-4
    )


def test_mimi_hf_rope_convention_is_discriminated():
    """The q/k un-permutation must matter: mapping HF weights without it
    diverges in attention (guards against a silently non-discriminating
    parity test)."""
    from mlx_audio_tpu.codec.mimi.mimi import sanitize_hf_mimi

    hf, ours = build_mimi_pair()
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((1, 24, 32)) * 4.0).astype(np.float32)
    with torch.no_grad():
        t_hf = hf.encoder_transformer(torch.from_numpy(x))[0].numpy()
    t_ours = np.asarray(ours.encoder_transformer(jnp.asarray(x))[0])
    assert np.abs(t_hf - t_ours).max() < 1e-5

    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    mapped = sanitize_hf_mimi(sd, n_heads=2, n_ratios=len(RATIOS))
    # undo the un-permutation on q/k (simulate the naive mapping)
    naive = dict(mapped)
    for k in list(naive):
        if k.endswith("self_attn.in_proj.weight"):
            pre = k[: -len("in_proj.weight")]
            q = sd[pre + "q_proj.weight"]
            kk = sd[pre + "k_proj.weight"]
            vv = sd[pre + "v_proj.weight"]
            naive[k] = np.concatenate([q, kk, vv], axis=0)
    wrong = update_arrays(ours, naive, strict=False)
    t_wrong = np.asarray(wrong.encoder_transformer(jnp.asarray(x))[0])
    assert np.abs(t_hf - t_wrong).max() > 1e-4
