from mlx_audio_tpu.models.tts.bark.bark import Model, ModelConfig
from mlx_audio_tpu.models.tts.bark.gpt import GPT, FineGPT, GPTConfig

__all__ = ["Model", "ModelConfig", "GPT", "FineGPT", "GPTConfig"]
