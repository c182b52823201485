"""Neural audio codecs (SURVEY.md §2.4): Mimi, EnCodec, SNAC, DAC, Vocos,
BigVGAN, S3 — every TTS family routes through one of these.

Mirrors the reference package exports (codec/models/__init__.py:1-5 exports
DAC, Encodec, Mimi, SNAC, Vocos) plus the families the reference keeps
un-exported (BigVGAN, S3Tokenizer).  Lazy so `import mlx_audio_tpu.codec`
stays cheap — model modules pull in jax graphs on first attribute access.
"""

_EXPORTS = {
    "DAC": "dac",
    "Encodec": "encodec",
    "Mimi": "mimi",
    "SNAC": "snac",
    "Vocos": "vocos",
    "BigVGAN": "bigvgan",
    "S3Tokenizer": "s3",
    "S3TokenizerV2": "s3",
}

__all__ = sorted(_EXPORTS)


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        mod = importlib.import_module(
            f"mlx_audio_tpu.codec.{_EXPORTS[name]}")
        return getattr(mod, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(set(globals()) | set(_EXPORTS))
