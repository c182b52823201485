from mlx_audio_tpu.models.stt.parakeet.parakeet import (
    BaseParakeet,
    Model,
    ParakeetCTC,
    ParakeetRNNT,
    ParakeetTDT,
)

__all__ = ["Model", "BaseParakeet", "ParakeetTDT", "ParakeetRNNT", "ParakeetCTC"]
