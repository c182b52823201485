from mlx_audio_tpu.codec.mimi.mimi import Mimi, MimiConfig, mimi_202407

__all__ = ["Mimi", "MimiConfig", "mimi_202407"]
