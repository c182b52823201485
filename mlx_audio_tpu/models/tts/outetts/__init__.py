from mlx_audio_tpu.models.tts.outetts.outetts import Model, ModelConfig
from mlx_audio_tpu.models.tts.outetts.prompt_processor import PromptProcessor
from mlx_audio_tpu.models.tts.outetts.audio_processor import AudioProcessor

__all__ = ["Model", "ModelConfig", "PromptProcessor", "AudioProcessor"]
