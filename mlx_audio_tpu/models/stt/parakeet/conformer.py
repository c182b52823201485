"""Parakeet's Conformer encoder (NeMo lineage), TPU-first NLC.

Capability parity with /root/reference/mlx_audio/stt/models/parakeet/
conformer.py:14-331 and attention.py:52-199: depthwise-striding 2D
subsampling, relative-position multi-head attention with the Transformer-XL
rel-shift, GLU conv module with (inference) batch norm.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.nn import BatchNorm, Conv1d, LayerNorm, Linear, Module
from mlx_audio_tpu.nn.layers import _uniform, promote_conv_operands


@dataclass
class ConformerArgs:
    feat_in: int
    n_layers: int
    d_model: int
    n_heads: int
    ff_expansion_factor: int
    subsampling_factor: int
    self_attention_model: str
    subsampling: str
    conv_kernel_size: int
    subsampling_conv_channels: int
    pos_emb_max_len: int
    causal_downsampling: bool = False
    use_bias: bool = True
    xscaling: bool = False
    subsampling_conv_chunking_factor: int = 1

    @classmethod
    def from_dict(cls, d: dict) -> "ConformerArgs":
        return cls(**{k: v for k, v in d.items() if k in cls.__dataclass_fields__})


class FeedForward(Module):
    def __init__(self, d_model: int, d_ff: int, use_bias: bool = True):
        self.linear1 = Linear(d_model, d_ff, bias=use_bias)
        self.linear2 = Linear(d_ff, d_model, bias=use_bias)

    def __call__(self, x):
        return self.linear2(jax.nn.silu(self.linear1(x)))


class Convolution(Module):
    def __init__(self, args: ConformerArgs):
        self.pointwise_conv1 = Conv1d(args.d_model, args.d_model * 2, 1,
                                      bias=args.use_bias)
        self.depthwise_conv = Conv1d(
            args.d_model, args.d_model, args.conv_kernel_size, stride=1,
            padding=(args.conv_kernel_size - 1) // 2, groups=args.d_model,
            bias=args.use_bias,
        )
        self.batch_norm = BatchNorm(args.d_model)
        self.pointwise_conv2 = Conv1d(args.d_model, args.d_model, 1,
                                      bias=args.use_bias)

    def __call__(self, x):
        x = self.pointwise_conv1(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * jax.nn.sigmoid(b)  # GLU
        x = self.depthwise_conv(x)
        x = self.batch_norm(x)
        x = jax.nn.silu(x)
        return self.pointwise_conv2(x)


class RelPositionMultiHeadAttention(Module):
    """Transformer-XL style relative-position attention (attention.py:52-137)."""

    def __init__(self, n_head: int, n_feat: int, bias: bool = True):
        self.n_head = n_head
        self.head_dim = n_feat // n_head
        self.scale = self.head_dim ** -0.5
        self.linear_q = Linear(n_feat, n_feat, bias=bias)
        self.linear_k = Linear(n_feat, n_feat, bias=bias)
        self.linear_v = Linear(n_feat, n_feat, bias=bias)
        self.linear_out = Linear(n_feat, n_feat, bias=bias)
        self.linear_pos = Linear(n_feat, n_feat, bias=False)
        self.pos_bias_u = jnp.zeros((n_head, self.head_dim))
        self.pos_bias_v = jnp.zeros((n_head, self.head_dim))

    @staticmethod
    def rel_shift(x: jax.Array) -> jax.Array:
        b, h, tq, pos_len = x.shape
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
        x = x.reshape(b, h, pos_len + 1, tq)[:, :, 1:, :]
        return x.reshape(b, h, tq, pos_len)

    def __call__(self, x, pos_emb, mask=None):
        b, t, _ = x.shape
        q = self.linear_q(x).reshape(b, t, self.n_head, self.head_dim)
        k = self.linear_k(x).reshape(b, t, self.n_head, self.head_dim)
        v = self.linear_v(x).reshape(b, t, self.n_head, self.head_dim)
        p = self.linear_pos(pos_emb)
        pos_len = pos_emb.shape[1]
        p = p.reshape(-1, pos_len, self.n_head, self.head_dim).transpose(0, 2, 1, 3)

        q_u = (q + self.pos_bias_u).transpose(0, 2, 1, 3)
        q_v = (q + self.pos_bias_v).transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)

        matrix_ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k)
        matrix_bd = jnp.einsum("bhqd,bhpd->bhqp", q_v, p)
        matrix_bd = self.rel_shift(matrix_bd)[..., : k.shape[-2]]
        scores = (matrix_ac + matrix_bd).astype(jnp.float32) * self.scale
        if mask is not None:
            scores = jnp.where(mask, -jnp.inf, scores)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, -1)
        return self.linear_out(out)


class RelPositionalEncoding:
    def __init__(self, d_model: int, max_len: int = 5000, scale_input: bool = False):
        self.d_model = d_model
        self.max_len = max_len
        self.scale = math.sqrt(d_model) if scale_input else 1.0
        self._pe = self._calculate(max_len)

    def _calculate(self, max_len: int) -> np.ndarray:
        positions = np.arange(max_len - 1, -max_len, -1, dtype=np.float32)[:, None]
        div = np.exp(np.arange(0, self.d_model, 2, dtype=np.float32)
                     * -(math.log(10000.0) / self.d_model))
        pe = np.zeros((2 * max_len - 1, self.d_model), dtype=np.float32)
        pe[:, 0::2] = np.sin(positions * div)
        pe[:, 1::2] = np.cos(positions * div)
        return pe[None]

    def __call__(self, x: jax.Array):
        input_len = x.shape[1]
        if input_len > self.max_len:
            self.max_len = input_len + 1
            self._pe = self._calculate(self.max_len)
        x = x * self.scale
        buf_len = self._pe.shape[1]
        start = buf_len // 2 - (input_len - 1)
        end = buf_len // 2 + (input_len - 1) + 1
        return x, jnp.asarray(self._pe[:, start:end], dtype=x.dtype)


class ConformerBlock(Module):
    def __init__(self, args: ConformerArgs):
        ff_dim = args.d_model * args.ff_expansion_factor
        self.norm_feed_forward1 = LayerNorm(args.d_model)
        self.feed_forward1 = FeedForward(args.d_model, ff_dim, args.use_bias)
        self.norm_self_att = LayerNorm(args.d_model)
        self.self_attn = RelPositionMultiHeadAttention(
            args.n_heads, args.d_model, bias=args.use_bias
        )
        self.norm_conv = LayerNorm(args.d_model)
        self.conv = Convolution(args)
        self.norm_feed_forward2 = LayerNorm(args.d_model)
        self.feed_forward2 = FeedForward(args.d_model, ff_dim, args.use_bias)
        self.norm_out = LayerNorm(args.d_model)

    def __call__(self, x, pos_emb, mask=None):
        x = x + 0.5 * self.feed_forward1(self.norm_feed_forward1(x))
        x = x + self.self_attn(self.norm_self_att(x), pos_emb, mask)
        x = x + self.conv(self.norm_conv(x))
        x = x + 0.5 * self.feed_forward2(self.norm_feed_forward2(x))
        return self.norm_out(x)


class Conv2dLayer(Module):
    """NHWC conv2d for the subsampling stack."""

    def __init__(self, in_ch, out_ch, kernel, stride, padding, groups=1):
        self.stride = stride
        self.padding = padding
        self.groups = groups
        scale = 1.0 / math.sqrt(in_ch * kernel * kernel / groups)
        self.weight = _uniform((kernel, kernel, in_ch // groups, out_ch), scale)
        self.bias = _uniform((out_ch,), scale)

    def __call__(self, x):
        x, w = promote_conv_operands(x, self.weight)
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )
        return y + self.bias


class DwStridingSubsampling(Module):
    """Depthwise-striding 2D subsampling (conformer.py:152-257), NHWC."""

    def __init__(self, args: ConformerArgs):
        self._sampling_num = int(math.log2(args.subsampling_factor))
        self._stride = 2
        self._kernel_size = 3
        self._padding = 1
        ch = args.subsampling_conv_channels
        final_freq = args.feat_in
        for _ in range(self._sampling_num):
            final_freq = (final_freq + 2 * self._padding - self._kernel_size) // 2 + 1
        conv = [Conv2dLayer(1, ch, 3, 2, 1)]
        for _ in range(self._sampling_num - 1):
            conv.append(Conv2dLayer(ch, ch, 3, 2, 1, groups=ch))
            conv.append(Conv2dLayer(ch, ch, 1, 1, 0))
        self.conv = conv
        self.out = Linear(ch * final_freq, args.d_model)

    def __call__(self, x: jax.Array, lengths: jax.Array):
        """x: [B, T, feat] -> ([B, T', d_model], lengths')."""
        for _ in range(self._sampling_num):
            lengths = (lengths + 2 * self._padding - self._kernel_size) // self._stride + 1
        h = x[..., None]  # [B, T, F, 1] NHWC
        for i, layer in enumerate(self.conv):
            h = layer(h)
            # ReLU after the first conv and after each pointwise conv
            if i == 0 or (i > 0 and i % 2 == 0):
                h = jax.nn.relu(h)
        b, t, f, c = h.shape
        h = h.transpose(0, 1, 3, 2).reshape(b, t, c * f)
        return self.out(h), lengths.astype(jnp.int32)


class Conformer(Module):
    def __init__(self, args: ConformerArgs):
        self.args_subsampling_factor = args.subsampling_factor
        if args.self_attention_model == "rel_pos":
            self.pos_enc = RelPositionalEncoding(
                args.d_model, args.pos_emb_max_len, scale_input=args.xscaling
            )
        else:
            self.pos_enc = None
        if args.subsampling_factor > 1:
            self.pre_encode = DwStridingSubsampling(args)
        else:
            self.pre_encode = Linear(args.feat_in, args.d_model)
        self.layers = [ConformerBlock(args) for _ in range(args.n_layers)]

    def __call__(self, x: jax.Array, lengths: Optional[jax.Array] = None):
        if lengths is None:
            lengths = jnp.full((x.shape[0],), x.shape[-2], dtype=jnp.int32)
        if isinstance(self.pre_encode, DwStridingSubsampling):
            x, out_lengths = self.pre_encode(x, lengths)
        else:
            x = self.pre_encode(x)
            out_lengths = lengths
        pos_emb = None
        if self.pos_enc is not None:
            x, pos_emb = self.pos_enc(x)
        for layer in self.layers:
            x = layer(x, pos_emb)
        return x, out_lengths
