"""BiCodec tokenizer: raw audio <-> (global, semantic) token streams.

Capability parity with /root/reference/mlx_audio/tts/models/spark/
audio_tokenizer.py:15-138. Semantic features come from a frozen
wav2vec2-large-xlsr-53, mixing hidden states (11 + 14 + 16) / 3
(reference :84-86); the speaker reference clip is tiled/truncated to
`ref_segment_duration` seconds (reference :40-53).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.models.stt.wav2vec.wav2vec import ModelConfig as W2VConfig
from mlx_audio_tpu.models.stt.wav2vec.wav2vec import Wav2Vec2Model

from .bicodec import BiCodec

DEFAULT_TOKENIZER_CONFIG: Dict[str, Any] = {
    # Spark-TTS-0.5B audio_tokenizer_config.yaml
    "sample_rate": 16000,
    "ref_segment_duration": 6,
    "latent_hop_length": 320,
    "volume_normalize": True,
}


def _zero_mean_unit_var(wav: np.ndarray) -> np.ndarray:
    """Wav2Vec2FeatureExtractor normalization (do_normalize=True)."""
    wav = np.asarray(wav, dtype=np.float32)
    return (wav - wav.mean()) / np.sqrt(wav.var() + 1e-7)


def audio_volume_normalize(audio: np.ndarray, coeff: float = 0.2) -> np.ndarray:
    """Percentile-based loudness normalization (reference
    spark/utils/audio.py:32-72): scale so the mean of the top 10%..1%
    absolute samples hits `coeff`, clamped to [0.1, 10]x and peak <= 1."""
    audio = np.asarray(audio, dtype=np.float32)
    temp = np.sort(np.abs(audio))
    if temp.size == 0:
        return audio
    if temp[-1] < 0.1:
        audio = audio / max(float(temp[-1]), 1e-3) * 0.1
    temp = temp[temp > 0.01]
    if temp.shape[0] <= 10:
        return audio
    volume = np.mean(temp[int(0.9 * len(temp)):int(0.99 * len(temp))])
    audio = audio * np.clip(coeff / volume, 0.1, 10)
    max_value = np.max(np.abs(audio))
    if max_value > 1:
        audio = audio / max_value
    return audio


class BiCodecTokenizer:
    def __init__(self, bicodec: Optional[BiCodec] = None,
                 wav2vec2: Optional[Wav2Vec2Model] = None,
                 config: Optional[Dict[str, Any]] = None):
        self.config = {**DEFAULT_TOKENIZER_CONFIG, **(config or {})}
        self.model = bicodec if bicodec is not None else BiCodec()
        if wav2vec2 is None:
            wav2vec2 = Wav2Vec2Model(W2VConfig(
                vocab_size=32, hidden_size=1024, num_hidden_layers=24,
                num_attention_heads=16, intermediate_size=4096,
                do_stable_layer_norm=True, feat_extract_norm="layer",
            ))
        self.feature_extractor = wav2vec2

    # -- audio prep --------------------------------------------------------

    def get_ref_clip(self, wav: np.ndarray) -> np.ndarray:
        """Tile/trim to a fixed-length speaker reference (reference :40-53)."""
        ref_segment_length = (
            int(self.config["sample_rate"] * self.config["ref_segment_duration"])
            // self.config["latent_hop_length"] * self.config["latent_hop_length"]
        )
        if ref_segment_length > len(wav):
            wav = np.tile(wav, ref_segment_length // len(wav) + 1)
        return wav[:ref_segment_length]

    def process_audio(self, wav) -> Tuple[np.ndarray, np.ndarray]:
        if isinstance(wav, (str, Path)):
            from mlx_audio_tpu.utils.audio_io import load_audio

            wav = load_audio(wav, sample_rate=self.config["sample_rate"])
        wav = np.asarray(wav, dtype=np.float32).reshape(-1)
        if self.config["volume_normalize"]:
            wav = audio_volume_normalize(wav)
        return wav, self.get_ref_clip(wav)[None]

    # -- features ----------------------------------------------------------

    def extract_wav2vec2_features(self, wavs: np.ndarray) -> jnp.ndarray:
        """wav [B, T] -> mixed hidden-state features [B, T', 1024]."""
        wavs = np.atleast_2d(np.asarray(wavs, dtype=np.float32))
        wavs = np.stack([_zero_mean_unit_var(w) for w in wavs])
        return _w2v_features_jit(self.feature_extractor, jnp.asarray(wavs))

    # -- token api ---------------------------------------------------------

    def tokenize(self, audio) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """audio (path or array) -> (global_tokens [1, 32],
        semantic_tokens [1, T])."""
        wav, ref_wav = self.process_audio(audio)
        feat = self.extract_wav2vec2_features(wav[None])
        semantic_tokens, global_tokens = self.model.tokenize(
            feat, jnp.asarray(ref_wav)
        )
        return global_tokens, semantic_tokens

    def detokenize(self, global_tokens, semantic_tokens) -> np.ndarray:
        wav = self.model.detokenize(
            jnp.asarray(semantic_tokens), jnp.asarray(global_tokens)
        )
        return np.asarray(wav).squeeze()


@jax.jit
def _w2v_features_jit(model, wavs):
    """Jitted wav2vec2 feature mix (model as pytree arg; docs/PERF.md)."""
    _, hidden = model(wavs, output_hidden_states=True)
    return (hidden[11] + hidden[14] + hidden[16]) / 3
