from mlx_audio_tpu.codec.dac.dac import DAC, DACConfig

__all__ = ["DAC", "DACConfig"]
