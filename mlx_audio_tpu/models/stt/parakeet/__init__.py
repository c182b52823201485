from mlx_audio_tpu.models.stt.parakeet.parakeet import (
    BaseParakeet,
    Model,
    ParakeetCTC,
    ParakeetRNNT,
    ParakeetTDT,
    sanitize_hf_parakeet,
)

__all__ = ["Model", "BaseParakeet", "ParakeetTDT", "ParakeetRNNT",
           "ParakeetCTC", "sanitize_hf_parakeet"]
