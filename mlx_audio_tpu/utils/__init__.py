from mlx_audio_tpu.utils.audio_io import load_audio, save_audio, resample_audio

__all__ = ["load_audio", "save_audio", "resample_audio"]
