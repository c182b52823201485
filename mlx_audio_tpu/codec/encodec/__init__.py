from mlx_audio_tpu.codec.encodec.encodec import (
    sanitize_hf_encodec,
    Encodec,
    EncodecConfig,
    preprocess_audio,
)

__all__ = ["Encodec", "EncodecConfig", "preprocess_audio",
           "sanitize_hf_encodec"]
