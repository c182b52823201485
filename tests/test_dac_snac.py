"""DAC and SNAC shape-contract tests (frame-rate arithmetic from the
reference suites codec/tests/test_descript.py and test_snac.py, run at
reduced channel widths — lengths depend only on rates/kernels)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_audio_tpu.codec.dac import DAC, DACConfig
from mlx_audio_tpu.codec.snac import SNAC, SNACConfig


def small_dac(sample_rate=16000, rates=(2, 4, 5, 8), n_codebooks=4):
    return DAC(DACConfig(
        encoder_dim=16,
        encoder_rates=list(rates),
        decoder_dim=128,
        decoder_rates=list(rates[::-1]),
        n_codebooks=n_codebooks,
        codebook_size=64,
        codebook_dim=8,
        sample_rate=sample_rate,
    ))


def test_dac_16khz_contract():
    model = small_dac()
    audio = jnp.zeros((1, 1, 80_000))
    z, codes, latents = model.encode(audio)
    assert z.shape == (1, 250, model.latent_dim)
    assert codes.shape == (1, 4, 250)
    assert latents.shape == (1, 250, 4 * 8)
    y = model.decode(z)
    # True torch-DAC arithmetic: 250 frames x 320 hop, with the 5-stride
    # transposed conv losing 8 samples total -> 79,992.  (The reference's
    # 80,043 comes from an MLX-port bug: positional `groups` lands in
    # conv_transpose1d's output_padding, adding +1 per stage.)
    assert y.shape == (1, 1, 79_992)
    assert np.isfinite(np.asarray(y)).all()


def test_dac_codes_roundtrip():
    model = small_dac()
    audio = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 1, 3200)) * 0.1,
        dtype=jnp.float32,
    )
    z, codes, _ = model.encode(audio)
    y1 = np.asarray(model.decode(z))
    y2 = np.asarray(model.decode_codes(codes))
    assert y1.shape == y2.shape
    np.testing.assert_allclose(y1, y2, atol=1e-4)
    c = np.asarray(codes)
    assert (c >= 0).all() and (c < 64).all()


def small_snac():
    return SNAC(SNACConfig(
        sampling_rate=24000,
        encoder_dim=16,
        encoder_rates=[2, 4, 8, 8],
        decoder_dim=128,
        decoder_rates=[8, 8, 4, 2],
        attn_window_size=None,
        codebook_size=64,
        codebook_dim=8,
        vq_strides=[4, 2, 1],
        noise=True,
        depthwise=True,
    ))


def test_snac_24khz_contract():
    model = small_snac()
    audio = jnp.zeros((1, 1, 120_000))
    codes = model.encode(audio)
    assert len(codes) == 3
    assert codes[0].shape == (1, 59)
    assert codes[1].shape == (1, 118)
    assert codes[2].shape == (1, 236)
    recon = model.decode(codes)
    # true torch-SNAC arithmetic: 236 frames x 512 hop (the reference's
    # 120,907 reflects the same output_padding port bug as DAC)
    assert recon.shape == (1, 1, 120_832)
    assert np.isfinite(np.asarray(recon)).all()


def test_snac_with_attention():
    model = SNAC(SNACConfig(
        sampling_rate=24000,
        encoder_dim=16,
        encoder_rates=[2, 4, 8, 8],
        decoder_dim=128,
        decoder_rates=[8, 8, 4, 2],
        attn_window_size=8,
        codebook_size=64,
        codebook_dim=8,
        vq_strides=[4, 2, 1],
        noise=False,
        depthwise=False,
    ))
    audio = jnp.zeros((1, 1, 24_000))
    codes = model.encode(audio)
    assert len(codes) == 3
    recon = model.decode(codes)
    assert np.isfinite(np.asarray(recon)).all()


def test_dac_call_returns_original_length():
    model = small_dac()
    audio = jnp.zeros((1, 1, 12_345))
    out = model(audio)
    assert out["audio"].shape == (1, 1, 12_345)


def test_snac_from_pretrained_roundtrip(tmp_path):
    """SNAC.from_pretrained loads a checkpoint directory in the published
    external layout (torch/MLX [O, K, I]-major weight-norm tensors) and
    reproduces the source model's codes."""
    import json

    from safetensors.numpy import save_file

    from mlx_audio_tpu.codec.snac import SNAC, SNACConfig
    from mlx_audio_tpu.nn.module import named_arrays

    cfg = dict(sampling_rate=24000, encoder_dim=4, encoder_rates=[2, 2],
               decoder_dim=8, decoder_rates=[2, 2], attn_window_size=None,
               codebook_size=16, codebook_dim=4, vq_strides=[2, 1],
               noise=False, depthwise=False)
    model = SNAC(SNACConfig.from_dict(cfg))
    # write weights in the external layout sanitize expects (inverse of the
    # [K, I, O] <- (1, 2, 0) mapping; snake alphas back to [1, C, 1])
    weights = {}
    for k, v in named_arrays(model):
        v = np.asarray(v)
        if k.endswith("alpha") and v.ndim == 1:
            v = v.reshape(1, -1, 1)
        elif (k.endswith("weight_v") or k.endswith("weight_g")) and v.ndim == 3:
            v = v.transpose(2, 0, 1)
        weights[k] = np.ascontiguousarray(v)
    ckpt = tmp_path / "snac"
    ckpt.mkdir()
    save_file(weights, str(ckpt / "model.safetensors"))
    with open(ckpt / "config.json", "w") as f:
        json.dump(cfg, f)

    loaded = SNAC.from_pretrained(str(ckpt))
    audio = (np.random.default_rng(0).standard_normal((1, 256, 1)) * 0.1
             ).astype(np.float32)
    import jax.numpy as jnp

    ref = [np.asarray(c) for c in model.encode(jnp.asarray(audio))]
    got = [np.asarray(c) for c in loaded.encode(jnp.asarray(audio))]
    for r, g in zip(ref, got):
        assert (r == g).all()


# -- chunked compress/decompress (reference descript/base.py:16-228) -------


def test_dac_output_length_matches_model():
    """get_output_length must equal the actual valid-conv chain output."""
    from mlx_audio_tpu.codec.dac.chunked import (
        get_output_length,
        unpadded_twin,
    )

    model = small_dac()
    twin = unpadded_twin(model)
    n = 64 * model.hop_length  # must exceed the valid-conv receptive field
    z, codes, _ = twin.encode(jnp.zeros((1, 1, n)))
    out = twin.decode(z)
    assert out.shape[-1] == get_output_length(model, n)
    # and the original model still pads (twin is a separate pytree);
    # 'same' mode may come a few samples short of n (odd strides pad
    # asymmetrically) but must stay within one hop
    z2, _, _ = model.encode(jnp.zeros((1, 1, n)))
    assert n - model.hop_length < model.decode(z2).shape[-1] <= n


def test_dac_compress_roundtrip_long(tmp_path):
    """Audio longer than the window: chunked valid-conv encode, .dac file
    save/load, decompress trims to the original sample count."""
    model = small_dac()
    sr = model.sample_rate
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(int(4.0 * sr)) * 0.3).astype(np.float32)

    f = model.compress(audio, win_duration=1.3)
    assert f.padding is False
    assert f.codes.shape[1] == model.n_codebooks
    assert f.codes.shape[-1] % f.chunk_length == 0

    path = f.save(tmp_path / "clip")
    assert path.suffix == ".dac"
    from mlx_audio_tpu.codec.dac import DACFile

    loaded = DACFile.load(path)
    assert (np.asarray(loaded.codes) == np.asarray(f.codes)).all()
    assert loaded.original_length == audio.shape[-1]

    wav = model.decompress(loaded)
    assert wav.shape == (1, audio.shape[-1])
    assert np.isfinite(wav).all()


def test_dac_compress_short_clip():
    """Clips <= win_duration take the single padded-encode path."""
    model = small_dac()
    sr = model.sample_rate
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(int(0.3 * sr)) * 0.3).astype(np.float32)
    f = model.compress(audio, win_duration=1.0)
    assert f.padding is True
    wav = model.decompress(f)
    assert wav.shape == (1, audio.shape[-1])


def test_dac_chunked_matches_serial_windows():
    """The batched window encode must equal encoding each window alone
    (the reference's serial loop, base.py:167-175)."""
    from mlx_audio_tpu.codec.dac.chunked import (
        get_delay,
        get_output_length,
        unpadded_twin,
    )

    model = small_dac()
    sr = model.sample_rate
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal(int(3.0 * sr)) * 0.3).astype(np.float32)
    f = model.compress(audio, win_duration=1.3, normalize_db=None)

    twin = unpadded_twin(model)
    delay = get_delay(model)
    n_samples = int(
        np.ceil(1.3 * sr / model.hop_length) * model.hop_length)
    hop = get_output_length(model, n_samples)
    padded = np.pad(audio, (delay, delay))
    serial = []
    for start in range(0, audio.shape[-1], hop):
        piece = padded[start: start + n_samples]
        piece = np.pad(piece, (0, n_samples - piece.shape[-1]))
        serial.append(np.asarray(
            twin.encode(jnp.asarray(piece)[None, None, :])[1]))
    serial = np.concatenate(serial, axis=-1)
    assert (np.asarray(f.codes) == serial).all()


def test_dac_decompress_reference_style_seconds(tmp_path):
    """Files written by the reference store original_length in float
    seconds — decompress must convert, not truncate to int samples."""
    from mlx_audio_tpu.codec.dac import DACFile

    model = small_dac()
    sr = model.sample_rate
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(int(0.4 * sr)) * 0.3).astype(np.float32)
    f = model.compress(audio, win_duration=1.0)
    ref_style = DACFile(
        codes=f.codes, chunk_length=f.chunk_length,
        original_length=audio.shape[-1] / sr, input_db=f.input_db,
        channels=1, sample_rate=sr, padding=True)
    wav = model.decompress(ref_style)
    assert wav.shape == (1, audio.shape[-1])
