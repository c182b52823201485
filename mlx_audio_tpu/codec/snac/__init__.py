from mlx_audio_tpu.codec.snac.snac import SNAC, SNACConfig

__all__ = ["SNAC", "SNACConfig"]
