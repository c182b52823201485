"""Wav2Vec2 — self-supervised speech representations (HF-compatible).

Capability parity with /root/reference/mlx_audio/stt/models/wav2vec/
wav2vec.py:27-714: conv feature encoder (group/layer-norm variants),
weight-normed positional conv embedding, transformer encoder (post-LN and
stable/pre-LN variants).  Feeds Spark-TTS's BiCodec tokenizer.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.models.base import BaseModelArgs
from mlx_audio_tpu.nn import Conv1d, LayerNorm, Linear, Module
from mlx_audio_tpu.nn.layers import _uniform, conv1d


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "wav2vec2"
    vocab_size: int = 32
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-5
    feat_extract_norm: str = "group"
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_bias: bool = False
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    num_feat_extract_layers: int = 7
    do_stable_layer_norm: bool = False
    output_hidden_states: bool = False


class GroupNormPerChannel(Module):
    """HF GroupNorm(groups=C, channels=C): per-channel stats over time."""

    def __init__(self, channels: int, eps: float = 1e-5):
        self.eps = eps
        self.weight = jnp.ones((channels,))
        self.bias = jnp.zeros((channels,))

    def __call__(self, x):
        mean = jnp.mean(x, axis=-2, keepdims=True)
        var = jnp.var(x, axis=-2, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * self.weight + self.bias


class ConvLayer(Module):
    def __init__(self, cfg: ModelConfig, layer_id: int = 0, norm: str = "none"):
        in_dim = cfg.conv_dim[layer_id - 1] if layer_id > 0 else 1
        out_dim = cfg.conv_dim[layer_id]
        self.conv = Conv1d(in_dim, out_dim, cfg.conv_kernel[layer_id],
                           stride=cfg.conv_stride[layer_id], bias=cfg.conv_bias)
        self.norm_type = norm
        if norm == "group":
            self.layer_norm = GroupNormPerChannel(out_dim)
        elif norm == "layer":
            self.layer_norm = LayerNorm(out_dim)
        else:
            self.layer_norm = None

    def __call__(self, x):
        x = self.conv(x)
        if self.layer_norm is not None:
            x = self.layer_norm(x)
        return jax.nn.gelu(x, approximate=False)


class PositionalConvEmbedding(Module):
    """Weight-normed grouped conv positions (wav2vec.py:216-245); torch
    weight-norm dim=2 puts g per-tap: v [k, in/g, out], g [k, 1, 1]."""

    def __init__(self, cfg: ModelConfig):
        k = cfg.num_conv_pos_embeddings
        g = cfg.num_conv_pos_embedding_groups
        d = cfg.hidden_size
        self.groups = g
        self.kernel = k
        scale = 1.0 / math.sqrt(d * k / g)
        v = _uniform((k, d // g, d), scale)
        self.weight_v = v
        self.weight_g = jnp.sqrt(jnp.sum(v * v, axis=(1, 2), keepdims=True))
        self.bias = jnp.zeros((d,))
        self.num_pad_remove = 1 if k % 2 == 0 else 0

    def __call__(self, x):
        norm = jnp.sqrt(jnp.sum(self.weight_v ** 2, axis=(1, 2), keepdims=True))
        w = self.weight_v / (norm + 1e-7) * self.weight_g
        y = conv1d(x, w, stride=1, padding=self.kernel // 2, groups=self.groups)
        y = y + self.bias
        if self.num_pad_remove > 0:
            y = y[:, : -self.num_pad_remove, :]
        return jax.nn.gelu(y, approximate=False)


class FeatureEncoder(Module):
    def __init__(self, cfg: ModelConfig):
        if cfg.feat_extract_norm == "group":
            layers = [ConvLayer(cfg, 0, norm="group")]
            layers += [ConvLayer(cfg, i) for i in range(1, cfg.num_feat_extract_layers)]
        else:
            layers = [ConvLayer(cfg, i, norm="layer")
                      for i in range(cfg.num_feat_extract_layers)]
        self.conv_layers = layers

    def __call__(self, input_values):
        """[B, T] waveform -> [B, T', conv_dim[-1]]."""
        x = input_values[..., None]
        for layer in self.conv_layers:
            x = layer(x)
        return x


class FeatureProjection(Module):
    def __init__(self, cfg: ModelConfig):
        self.layer_norm = LayerNorm(cfg.conv_dim[-1], eps=cfg.layer_norm_eps)
        self.projection = Linear(cfg.conv_dim[-1], cfg.hidden_size)

    def __call__(self, x):
        norm = self.layer_norm(x)
        return self.projection(norm), norm


class W2VAttention(Module):
    def __init__(self, cfg: ModelConfig):
        d = cfg.hidden_size
        self.n_head = cfg.num_attention_heads
        self.head_dim = d // self.n_head
        self.q_proj = Linear(d, d)
        self.k_proj = Linear(d, d)
        self.v_proj = Linear(d, d)
        self.out_proj = Linear(d, d)

    def __call__(self, x, mask=None):
        b, t, d = x.shape

        def split(z):
            return z.reshape(b, t, self.n_head, self.head_dim).transpose(0, 2, 1, 3)

        q = split(self.q_proj(x))
        k = split(self.k_proj(x))
        v = split(self.v_proj(x))
        scale = self.head_dim ** -0.5
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
        if mask is not None:
            scores = scores + mask
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        return self.out_proj(out.transpose(0, 2, 1, 3).reshape(b, t, d))


class FeedForward(Module):
    def __init__(self, cfg: ModelConfig):
        self.intermediate_dense = Linear(cfg.hidden_size, cfg.intermediate_size)
        self.output_dense = Linear(cfg.intermediate_size, cfg.hidden_size)

    def __call__(self, x):
        return self.output_dense(jax.nn.gelu(self.intermediate_dense(x),
                                             approximate=False))


class EncoderLayer(Module):
    def __init__(self, cfg: ModelConfig, stable: bool = False):
        self.stable = stable
        self.attention = W2VAttention(cfg)
        self.layer_norm = LayerNorm(cfg.hidden_size, eps=cfg.layer_norm_eps)
        self.feed_forward = FeedForward(cfg)
        self.final_layer_norm = LayerNorm(cfg.hidden_size, eps=cfg.layer_norm_eps)

    def __call__(self, x, mask=None):
        if self.stable:
            x = x + self.attention(self.layer_norm(x), mask)
            x = x + self.feed_forward(self.final_layer_norm(x))
        else:
            x = self.layer_norm(x + self.attention(x, mask))
            x = self.final_layer_norm(x + self.feed_forward(x))
        return x


class Encoder(Module):
    def __init__(self, cfg: ModelConfig):
        self.stable = cfg.do_stable_layer_norm
        self.pos_conv_embed = PositionalConvEmbedding(cfg)
        self.layer_norm = LayerNorm(cfg.hidden_size, eps=cfg.layer_norm_eps)
        self.layers = [EncoderLayer(cfg, stable=self.stable)
                       for _ in range(cfg.num_hidden_layers)]

    def __call__(self, x, mask=None, output_hidden_states: bool = False):
        x = x + self.pos_conv_embed(x)
        if not self.stable:
            x = self.layer_norm(x)
        hidden_states = [x] if output_hidden_states else None
        for layer in self.layers:
            x = layer(x, mask)
            if output_hidden_states:
                hidden_states.append(x)
        if self.stable:
            x = self.layer_norm(x)
        return x, hidden_states


class Wav2Vec2Model(Module):
    def __init__(self, config):
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        self.config = config
        self.feature_extractor = FeatureEncoder(config)
        self.feature_projection = FeatureProjection(config)
        self.encoder = Encoder(config)

    def __call__(self, input_values: jax.Array,
                 output_hidden_states: bool = False):
        """[B, T] waveform -> (last_hidden [B, T', D], extract_features,
        hidden_states?)."""
        extract = self.feature_extractor(input_values)
        hidden, norm_features = self.feature_projection(extract)
        last, hiddens = self.encoder(hidden,
                                     output_hidden_states=output_hidden_states)
        return last, norm_features, hiddens

    def sanitize(self, weights: dict) -> dict:
        """HF torch checkpoints: conv [O, I, K] -> [K, I, O]; pos-conv
        weight-norm g [1, 1, K] -> [K, 1, 1].  Handles both legacy
        (weight_g/weight_v) and modern torch parametrizations
        (conv.parametrizations.weight.original0/1) key styles."""
        out = {}
        for k, v in weights.items():
            v = np.asarray(v)
            if "pos_conv_embed" in k:
                k = (k.replace(".conv.parametrizations.weight.original0",
                               ".weight_g")
                     .replace(".conv.parametrizations.weight.original1",
                              ".weight_v")
                     .replace(".conv.weight_g", ".weight_g")
                     .replace(".conv.weight_v", ".weight_v")
                     .replace(".conv.bias", ".bias"))
            if "pos_conv_embed" in k and k.endswith("weight_v") and v.ndim == 3:
                v = v.transpose(2, 1, 0)
            elif "pos_conv_embed" in k and k.endswith("weight_g") and v.ndim == 3:
                v = v.transpose(2, 1, 0)
            elif k.endswith("conv.weight") and v.ndim == 3:
                v = v.transpose(2, 1, 0)
            out[k] = v
        return out


# registry alias
Model = Wav2Vec2Model
