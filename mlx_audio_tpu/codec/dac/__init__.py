from mlx_audio_tpu.codec.dac.chunked import DACFile
from mlx_audio_tpu.codec.dac.dac import DAC, DACConfig

__all__ = ["DAC", "DACConfig", "DACFile"]
