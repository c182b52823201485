from mlx_audio_tpu.codec.bigvgan.bigvgan import BigVGAN, BigVGANConfig

__all__ = ["BigVGAN", "BigVGANConfig"]
