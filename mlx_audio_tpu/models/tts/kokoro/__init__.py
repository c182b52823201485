from mlx_audio_tpu.models.tts.kokoro.model import Model, ModelConfig, sanitize
from mlx_audio_tpu.models.tts.kokoro.pipeline import KokoroPipeline

__all__ = ["Model", "ModelConfig", "sanitize", "KokoroPipeline"]
