from mlx_audio_tpu.models.stt.whisper.model import ModelDimensions, WhisperModel

# registry alias: the generic loader looks for ModelConfig
ModelConfig = ModelDimensions
from mlx_audio_tpu.models.stt.whisper.transcribe import Model, STTOutput
from mlx_audio_tpu.models.stt.whisper.decoding import (
    DecodingOptions,
    DecodingResult,
)

__all__ = [
    "Model",
    "WhisperModel",
    "ModelDimensions",
    "STTOutput",
    "DecodingOptions",
    "DecodingResult",
]
