"""Centralized neural building blocks (the reference duplicates these per
model family — SURVEY.md layer 2; here they live in one library)."""

from mlx_audio_tpu.nn.module import (
    Module,
    map_arrays,
    named_arrays,
    update_arrays,
)
from mlx_audio_tpu.nn.layers import (
    AdaIN1d,
    BatchNorm,
    AdaLayerNorm,
    Conv1d,
    Conv2d,
    ConvTranspose1d,
    Embedding,
    Identity,
    InstanceNorm1d,
    LayerNorm,
    Linear,
    RMSNorm,
    WNConv1d,
    WNConvTranspose1d,
    conv1d,
    conv_transpose1d,
    depthwise_conv_transpose1d,
    get_padding,
    leaky_relu,
    snake,
    snake_beta,
    weight_norm,
)
from mlx_audio_tpu.nn.recurrent import LSTM, lstm_scan, masked_flip
from mlx_audio_tpu.nn.attention import (
    KVCache,
    MultiHeadAttention,
    apply_rope,
    cached_attention,
    causal_mask,
    rope_table,
    scaled_dot_product_attention,
)
from mlx_audio_tpu.nn.interpolate import interpolate, interpolate1d

__all__ = [
    "Module", "named_arrays", "update_arrays", "map_arrays",
    "Linear", "Embedding", "LayerNorm", "RMSNorm", "InstanceNorm1d",
    "AdaIN1d", "AdaLayerNorm", "BatchNorm", "Conv1d", "Conv2d", "ConvTranspose1d", "WNConv1d",
    "WNConvTranspose1d", "Identity", "conv1d", "conv_transpose1d",
    "depthwise_conv_transpose1d", "weight_norm", "get_padding",
    "leaky_relu", "snake", "snake_beta",
    "LSTM", "lstm_scan", "masked_flip",
    "KVCache", "MultiHeadAttention", "apply_rope", "cached_attention",
    "causal_mask", "rope_table", "scaled_dot_product_attention",
    "interpolate", "interpolate1d",
]
