from mlx_audio_tpu.codec.encodec.encodec import (
    Encodec,
    EncodecConfig,
    preprocess_audio,
)

__all__ = ["Encodec", "EncodecConfig", "preprocess_audio"]
