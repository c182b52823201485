from mlx_audio_tpu.models.tts.llama.llama import (
    Model,
    ModelConfig,
    decode_audio_from_codes,
    encode_audio_to_codes,
)

__all__ = ["Model", "ModelConfig", "decode_audio_from_codes",
           "encode_audio_to_codes"]
