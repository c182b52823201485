"""IndexTTS conditioning Conformer (wenet-style).

Capability parity with /root/reference/mlx_audio/tts/models/indextts/
conformer.py:14-247.  NLC throughout; the conv2d subsampling runs NHWC on
the MXU; blocks are plain functional modules (no python-state caches —
conditioning is always a single full-sequence pass).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from mlx_audio_tpu.models.stt.parakeet.conformer import Conv2dLayer
from mlx_audio_tpu.nn import LayerNorm, Linear, Module

from .attention import (
    MultiHeadAttention,
    RelPositionalEncoding,
    RelPositionMultiHeadAttention,
)


@dataclass
class ConformerArgs:
    input_size: int = 100
    output_size: int = 256
    num_blocks: int = 6
    linear_units: int = 2048
    attention_heads: int = 4
    pos_enc_layer_type: str = "rel_pos"
    input_layer: str = "conv2d"
    cnn_module_kernel: int = 15
    pos_emb_max_len: int = 2048
    causal_downsampling: bool = False
    use_bias: bool = True
    xscaling: bool = True
    macaron_style: bool = False
    perceiver_mult: int = 2


class FeedForward(Module):
    def __init__(self, dim: int, d_ff: int, use_bias: bool = True):
        self.w_1 = Linear(dim, d_ff, bias=use_bias)
        self.w_2 = Linear(d_ff, dim, bias=use_bias)

    def __call__(self, x):
        return self.w_2(jax.nn.silu(self.w_1(x)))


class Convolution(Module):
    """GLU pointwise -> depthwise -> LN -> SiLU -> pointwise
    (conformer.py:45-87; LayerNorm in place of BatchNorm, as reference)."""

    def __init__(self, args: ConformerArgs):
        assert (args.cnn_module_kernel - 1) % 2 == 0
        from mlx_audio_tpu.nn import Conv1d

        d = args.output_size
        self.pointwise_conv1 = Conv1d(d, d * 2, 1, bias=args.use_bias)
        self.depthwise_conv = Conv1d(
            d, d, args.cnn_module_kernel, padding=(args.cnn_module_kernel - 1) // 2,
            groups=d, bias=args.use_bias,
        )
        self.norm = LayerNorm(d)
        self.pointwise_conv2 = Conv1d(d, d, 1, bias=args.use_bias)

    def __call__(self, x):
        x = self.pointwise_conv1(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * jax.nn.sigmoid(b)
        x = self.depthwise_conv(x)
        x = jax.nn.silu(self.norm(x))
        return self.pointwise_conv2(x)


class ConformerBlock(Module):
    def __init__(self, args: ConformerArgs):
        self.macaron_style = args.macaron_style
        self.ff_scale = 0.5 if args.macaron_style else 1.0
        if args.macaron_style:
            self.norm_ff_macaron = LayerNorm(args.output_size)
            self.feed_forward_macaron = FeedForward(
                args.output_size, args.linear_units, args.use_bias
            )
        self.norm_mha = LayerNorm(args.output_size)
        if args.pos_enc_layer_type == "rel_pos":
            self.self_attn = RelPositionMultiHeadAttention(
                args.attention_heads, args.output_size, bias=args.use_bias
            )
        else:
            self.self_attn = MultiHeadAttention(
                args.attention_heads, args.output_size, bias=True
            )
        self.norm_conv = LayerNorm(args.output_size)
        self.conv_module = Convolution(args)
        self.norm_ff = LayerNorm(args.output_size)
        self.feed_forward = FeedForward(
            args.output_size, args.linear_units, args.use_bias
        )
        self.norm_final = LayerNorm(args.output_size)

    def __call__(self, x, pos_emb=None, mask=None):
        if self.macaron_style:
            x = x + self.ff_scale * self.feed_forward_macaron(
                self.norm_ff_macaron(x)
            )
        xn = self.norm_mha(x)
        x = x + self.self_attn(xn, xn, xn, pos_emb=pos_emb, mask=mask)
        x = x + self.conv_module(self.norm_conv(x))
        x = x + self.ff_scale * self.feed_forward(self.norm_ff(x))
        return self.norm_final(x)


class Conv2dSubsampling(Module):
    """VALID-padded conv2d stack over [B, T, F] (conformer.py:149-207)."""

    CONV_LAYERS = {
        "conv2d2": [(3, 2)],
        "conv2d3": [(5, 3)],
        "conv2d4": [(3, 2), (3, 2)],
        "conv2d6": [(3, 2), (5, 3)],
        "conv2d8": [(3, 2), (3, 2), (3, 2)],
    }

    def __init__(self, args: ConformerArgs):
        conv_layers = self.CONV_LAYERS[args.input_layer]
        self.conv = []
        in_channels = 1
        out_freq = args.input_size
        for kernel_size, stride in conv_layers:
            self.conv.append(Conv2dLayer(in_channels, args.output_size,
                                         kernel_size, stride, 0))
            in_channels = args.output_size
            out_freq = (out_freq - kernel_size + stride) // stride
        self.out = Linear(args.output_size * out_freq, args.output_size)

    def __call__(self, x: jax.Array) -> jax.Array:
        """[B, T, F] -> [B, T', output_size]."""
        x = x[:, :, :, None]  # NHWC: H=time, W=freq
        for conv in self.conv:
            x = jax.nn.relu(conv(x))
        # [B, T', F', C] -> [B, T', C*F'] (swap C before F, reference :198)
        x = jnp.swapaxes(x, 2, 3).reshape(x.shape[0], x.shape[1], -1)
        return self.out(x)


class Conformer(Module):
    def __init__(self, args: ConformerArgs):
        self.args = args
        if args.pos_enc_layer_type == "rel_pos":
            self.pos_enc = RelPositionalEncoding(
                d_model=args.output_size, max_len=args.pos_emb_max_len,
                scale_input=args.xscaling,
            )
        else:
            self.pos_enc = None
        self.embed = Conv2dSubsampling(args)
        self.encoders = [ConformerBlock(args) for _ in range(args.num_blocks)]
        self.after_norm = LayerNorm(args.output_size, eps=1e-5)

    def __call__(self, x: jax.Array) -> jax.Array:
        """mel [B, T, input_size] -> latent [B, T', output_size]."""
        x = self.embed(x)
        pos_emb = None
        if self.pos_enc is not None:
            x, pos_emb = self.pos_enc(x)
        for layer in self.encoders:
            x = layer(x, pos_emb=pos_emb)
        return self.after_norm(x)
