from mlx_audio_tpu.models.stt.wav2vec.wav2vec import (
    Model,
    ModelConfig,
    Wav2Vec2Model,
)

__all__ = ["Model", "ModelConfig", "Wav2Vec2Model"]
