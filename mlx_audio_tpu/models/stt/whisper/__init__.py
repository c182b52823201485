from mlx_audio_tpu.models.stt.whisper.model import ModelDimensions, WhisperModel
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
