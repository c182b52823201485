from mlx_audio_tpu.codec.vocos.vocos import (
    ISTFTHead,
    MelSpectrogramFeatures,
    Vocos,
    VocosBackbone,
)

__all__ = ["Vocos", "VocosBackbone", "ISTFTHead", "MelSpectrogramFeatures"]
