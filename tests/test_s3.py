"""S3 tokenizer tests (reference codec/tests/test_s3.py contract: mel in,
token codes + lengths out at the 25/50 Hz rates)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mlx_audio_tpu.codec.s3 import S3Config, S3Tokenizer, S3TokenizerV2, log_mel_spectrogram


def small_cfg():
    return S3Config(n_mels=128, n_audio_ctx=1500, n_audio_state=64,
                    n_audio_head=4, n_audio_layer=2, n_codebook_size=128)


def test_log_mel_shape():
    mel = np.asarray(log_mel_spectrogram(np.zeros(16000, dtype=np.float32)))
    assert mel.shape[0] == 128
    assert np.isfinite(mel).all()


def test_v1_quantize_50hz():
    model = S3Tokenizer("speech_tokenizer_v1", small_cfg())
    mel = jnp.zeros((1, 128, 200))
    codes, lens = model(mel, jnp.asarray([200]))
    # stride 1 conv then stride 2: 200 -> 200 -> 100
    assert codes.shape == (1, 100)
    assert int(lens[0]) == 100
    assert (np.asarray(codes) >= 0).all() and (np.asarray(codes) < 128).all()


def test_v1_quantize_25hz():
    model = S3Tokenizer("speech_tokenizer_v1_25hz", small_cfg())
    mel = jnp.zeros((1, 128, 200))
    codes, lens = model(mel, jnp.asarray([200]))
    assert codes.shape == (1, 50)
    assert int(lens[0]) == 50


def test_v2_fsq_range():
    model = S3TokenizerV2("speech_tokenizer_v2_25hz", small_cfg())
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 128, 100)) * 0.1,
        dtype=jnp.float32,
    )
    codes, lens = model(mel, jnp.asarray([100]))
    assert codes.shape == (1, 25)
    c = np.asarray(codes)
    assert (c >= 0).all() and (c < 3 ** 8).all()


def test_padded_batch_lengths():
    model = S3Tokenizer("speech_tokenizer_v1", small_cfg())
    mel = jnp.zeros((2, 128, 200))
    codes, lens = model(mel, jnp.asarray([200, 120]))
    assert codes.shape == (2, 100)
    assert int(lens[0]) == 100 and int(lens[1]) == 60


def test_s3_from_pretrained_roundtrip(tmp_path):
    """S3TokenizerV2.from_pretrained loads a named safetensors checkpoint
    (MLX-community layout: conv weights [O, K, I]-major) and reproduces the
    source model's codes (reference s3/model_v2.py:355-370)."""
    import numpy as np
    from safetensors.numpy import save_file

    import jax.numpy as jnp
    from mlx_audio_tpu.codec.s3.s3 import S3Config, S3TokenizerV2
    from mlx_audio_tpu.nn.module import named_arrays

    cfg = S3Config(n_mels=8, n_audio_state=16, n_audio_head=2,
                   n_audio_layer=1)
    name = "speech_tokenizer_v2_25hz"
    model = S3TokenizerV2(name, config=cfg)
    weights = {}
    for k, v in named_arrays(model):
        v = np.asarray(v)
        if k.endswith(".weight") and v.ndim == 3:
            v = v.transpose(2, 0, 1)  # ours [K, I, O] -> external [O, K, I]
        weights[k] = np.ascontiguousarray(v)
    save_file(weights, str(tmp_path / f"{name}.safetensors"))

    loaded = S3TokenizerV2.from_pretrained(name=name, repo_id=str(tmp_path),
                                           config=cfg)

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 8, 64)).astype(np.float32)
    mel_len = jnp.asarray([64])
    ref_codes, ref_len = model.quantize(jnp.asarray(mel), mel_len)
    got_codes, got_len = loaded.quantize(jnp.asarray(mel), mel_len)
    assert (np.asarray(ref_codes) == np.asarray(got_codes)).all()
    assert int(ref_len[0]) == int(got_len[0])
