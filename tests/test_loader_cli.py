"""Loader/registry + CLI round-trip tests: save a native checkpoint, load it
through the registry, and drive the TTS CLI end to end."""

import json
import sys

import numpy as np
import pytest

from mlx_audio_tpu.utils.loader import (
    MODEL_REMAPPING,
    get_available_models,
    get_model_and_args,
    load_model,
    save_checkpoint,
)


def test_available_models():
    tts = get_available_models("tts")
    assert "kokoro" in tts
    assert "sesame" in tts
    stt = get_available_models("stt")
    assert "whisper" in stt


def test_model_remapping():
    arch, mt = get_model_and_args("csm", None)
    assert mt == "sesame"
    arch, mt = get_model_and_args("kokoro", ["kokoro", "82m"])
    assert mt == "kokoro"


def test_unknown_model_raises():
    with pytest.raises(ValueError):
        get_model_and_args("nonexistent_model_xyz", None)


@pytest.fixture(scope="module")
def kokoro_ckpt(tmp_path_factory):
    from test_kokoro import tiny_config
    from mlx_audio_tpu.models.tts.kokoro import Model

    cfg = tiny_config()
    model = Model(cfg)
    out = tmp_path_factory.mktemp("kokoro_ckpt")
    config_dict = {
        "model_type": "kokoro",
        "istftnet": cfg.istftnet,
        "dim_in": cfg.dim_in,
        "dropout": cfg.dropout,
        "hidden_dim": cfg.hidden_dim,
        "max_conv_dim": cfg.max_conv_dim,
        "max_dur": cfg.max_dur,
        "multispeaker": cfg.multispeaker,
        "n_layer": cfg.n_layer,
        "n_mels": cfg.n_mels,
        "n_token": cfg.n_token,
        "style_dim": cfg.style_dim,
        "text_encoder_kernel_size": cfg.text_encoder_kernel_size,
        "plbert": cfg.plbert,
        "vocab": cfg.vocab,
    }
    save_checkpoint(model, out, config_dict)
    return out, model


def test_native_roundtrip(kokoro_ckpt):
    path, orig = kokoro_ckpt
    loaded = load_model(str(path), domain="tts")
    from mlx_audio_tpu.nn.module import named_arrays

    orig_w = dict(named_arrays(orig))
    loaded_w = dict(named_arrays(loaded))
    assert set(orig_w) == set(loaded_w)
    for k in list(orig_w)[::7]:
        np.testing.assert_array_equal(np.asarray(orig_w[k]), np.asarray(loaded_w[k]))


def test_tts_cli_end_to_end(kokoro_ckpt, tmp_path, monkeypatch):
    path, _ = kokoro_ckpt
    pack = (np.random.default_rng(0).standard_normal((510, 1, 256)) * 0.1).astype(np.float32)
    voice_path = tmp_path / "voice.npy"
    np.save(voice_path, pack)

    monkeypatch.chdir(tmp_path)
    from mlx_audio_tpu.tts.generate import main

    main([
        "--model", str(path),
        "--text", "hello world",
        "--voice", str(voice_path),
        "--file_prefix", "out",
        "--join_audio",
    ])
    wav = tmp_path / "out.wav"
    assert wav.exists()
    from mlx_audio_tpu.utils.audio_io import load_audio

    audio = load_audio(wav)
    assert audio.shape[0] > 1000
    assert np.isfinite(audio).all()


def test_audio_io_roundtrip(tmp_path):
    from mlx_audio_tpu.utils.audio_io import load_audio, resample_audio, save_audio

    x = np.sin(np.linspace(0, 100, 24000)).astype(np.float32) * 0.5
    p = tmp_path / "t.wav"
    save_audio(p, x, 24000)
    y = load_audio(p)
    assert y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1e-3)

    z = load_audio(p, sample_rate=16000)
    assert abs(z.shape[0] - 16000) < 10
    r = resample_audio(x, 24000, 8000)
    assert abs(r.shape[0] - 8000) < 10


def test_codec_package_exports():
    """Reference parity: codec/models/__init__.py:1-5 exports DAC, Encodec,
    Mimi, SNAC, Vocos (we add BigVGAN + S3) — lazily, so the package import
    stays cheap."""
    import mlx_audio_tpu.codec as codec

    for name in ("DAC", "Encodec", "Mimi", "SNAC", "Vocos", "BigVGAN",
                 "S3Tokenizer", "S3TokenizerV2"):
        assert callable(getattr(codec, name)), name
    assert "Mimi" in dir(codec)


def test_audio_io_non_wav_formats_gated(tmp_path):
    """Non-wav containers route through optional soundfile with a clear
    error when absent — never silently write wav bytes under .flac."""
    import pytest

    from mlx_audio_tpu.utils.audio_io import load_audio, save_audio

    x = np.zeros(1000, dtype=np.float32)
    try:
        import soundfile  # noqa: F401

        p = save_audio(tmp_path / "t.flac", x, 24000)
        assert load_audio(p).shape[0] == 1000
    except ImportError:
        with pytest.raises(RuntimeError, match="soundfile"):
            save_audio(tmp_path / "t.flac", x, 24000)
        (tmp_path / "t.flac").write_bytes(b"fLaC....")
        with pytest.raises(RuntimeError, match="soundfile"):
            load_audio(tmp_path / "t.flac")


def test_audio_player_headless():
    from mlx_audio_tpu.tts.audio_player import AudioPlayer

    p = AudioPlayer(sample_rate=24000)
    p.queue_audio(np.zeros(2400, dtype=np.float32))
    assert p.wait_for_drain(timeout=5)
    p.flush()
    p.stop()


def test_stt_cli_writers_accept_parakeet_result(tmp_path, monkeypatch):
    """The STT CLI must handle Parakeet's AlignedResult (text + sentences,
    no .segments/.language) — it previously crashed after transcription."""
    import numpy as np

    from mlx_audio_tpu.models.stt.parakeet.alignment import (
        AlignedResult,
        AlignedSentence,
        AlignedToken,
    )
    from mlx_audio_tpu.stt import generate as G

    tok = AlignedToken(0, text="hi", start=0.0, duration=0.5)
    res = AlignedResult(text="hi", sentences=[
        AlignedSentence(text="hi", tokens=[tok])
    ])

    class FakeModel:
        def generate(self, path, **kw):
            return res

    monkeypatch.setattr(
        "mlx_audio_tpu.utils.loader.load_model",
        lambda *a, **k: FakeModel(),
    )
    from mlx_audio_tpu.utils.audio_io import save_audio

    wav = tmp_path / "a.wav"
    save_audio(str(wav), np.zeros(1600, dtype=np.float32), 16000)
    out = G.generate("any", str(wav), str(tmp_path), "srt")
    assert out.text == "hi"
    srt = next(tmp_path.glob("*.srt"))
    assert "hi" in srt.read_text()
