from mlx_audio_tpu.models.stt.voxtral.voxtral import Model, ModelConfig

__all__ = ["Model", "ModelConfig"]
