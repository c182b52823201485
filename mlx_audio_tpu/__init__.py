"""mlx_audio_tpu — a TPU-native (JAX/XLA/Pallas) speech framework.

Re-creates the capability surface of `mlx-audio` (TTS, STT, neural audio
codecs, realtime speech-to-speech, serving) with a TPU-first architecture:
static-shaped jitted graphs, `lax.scan` decode loops, Pallas kernels for the
hot DSP/conv paths, and `jax.sharding` meshes for multi-chip scale-out.
"""

__version__ = "0.1.0"

from mlx_audio_tpu import dsp
from mlx_audio_tpu.dsp import istft, mel_filters, stft

__all__ = ["dsp", "stft", "istft", "mel_filters", "__version__"]
