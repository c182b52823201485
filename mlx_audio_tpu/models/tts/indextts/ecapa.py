"""IndexTTS speaker encoder: ECAPA-TDNN (speechbrain-flavored).

Capability parity with /root/reference/mlx_audio/tts/models/indextts/
ecapa_tdnn/{tdnn,se_res2net,asp,ecapa_tdnn}.py.  Distinct from Spark's
ECAPA (modules.py): TDNN blocks reflect-pad explicitly, Res2Net feeds the
previous *output* forward, ASP keeps [B, 1, 2C] for a 1x1-conv projection
head, and the SeRes2Net residual adds onto the shortcut-projected input
(reference se_res2net.py:127-132 quirk).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

import jax
import jax.numpy as jnp

from mlx_audio_tpu.nn import BatchNorm, Conv1d, Module


@dataclass
class ECPATDNNArgs:
    input_size: int
    lin_neurons: int = 192
    channels: List[int] = field(
        default_factory=lambda: [512, 512, 512, 512, 1536])
    kernel_sizes: List[int] = field(default_factory=lambda: [5, 3, 3, 3, 1])
    dilations: List[int] = field(default_factory=lambda: [1, 2, 3, 4, 1])
    attention_channels: int = 128
    res2net_scale: int = 8
    se_channels: int = 128
    global_context: bool = True
    groups: List[int] = field(default_factory=lambda: [1, 1, 1, 1, 1])


class TDNN(Module):
    """conv (reflect-padded) + relu + batchnorm (tdnn.py:6-42)."""

    def __init__(self, in_channels, out_channels, kernel_size, dilation=1,
                 groups=1, bias=True):
        self.pad = ((kernel_size - 1) * dilation) // 2
        self.conv = Conv1d(in_channels, out_channels, kernel_size, 1, 0,
                           dilation, groups, bias)
        self.norm = BatchNorm(out_channels)

    def __call__(self, x):
        if self.pad > 0:
            x = jnp.pad(x, ((0, 0), (self.pad, self.pad), (0, 0)),
                        mode="reflect")
        return self.norm(jax.nn.relu(self.conv(x)))


class Res2Net(Module):
    def __init__(self, in_channels, out_channels, kernel_size, scale,
                 dilation=1, groups=1, bias=True):
        assert in_channels % scale == out_channels % scale == 0
        self.scale = scale
        self.blocks = [
            TDNN(in_channels // scale, out_channels // scale, kernel_size,
                 dilation, groups, bias)
            for _ in range(scale - 1)
        ]

    def __call__(self, x):
        segments = jnp.split(x, self.scale, axis=-1)
        y = [segments[0]]
        for i in range(1, len(segments)):
            prev = y[-1] if i > 1 else 0
            y.append(self.blocks[i - 1](segments[i] + prev))
        return jnp.concatenate(y, axis=-1)


class SE(Module):
    def __init__(self, in_channels, se_channels, out_channels):
        self.conv1 = Conv1d(in_channels, se_channels, 1)
        self.conv2 = Conv1d(se_channels, out_channels, 1)

    def __call__(self, x):
        s = jnp.mean(x, axis=1, keepdims=True)
        s = jax.nn.sigmoid(self.conv2(jax.nn.relu(self.conv1(s))))
        return s * x


class SeRes2Net(Module):
    def __init__(self, in_channels, out_channels, scale, attention_channels,
                 kernel_size=1, dilation=1, groups=1, bias=True):
        self.tdnn1 = TDNN(in_channels, out_channels, 1, 1, groups)
        self.res2net_block = Res2Net(out_channels, out_channels, kernel_size,
                                     scale, dilation=dilation)
        self.tdnn2 = TDNN(out_channels, out_channels, 1, 1, groups)
        self.se_block = SE(out_channels, attention_channels, out_channels)
        self.shortcut = (
            Conv1d(in_channels, out_channels, 1)
            if in_channels != out_channels else None
        )

    def __call__(self, x):
        if self.shortcut is not None:
            x = self.shortcut(x)
        return x + self.se_block(self.tdnn2(self.res2net_block(self.tdnn1(x))))


class AttentiveStatisticsPooling(Module):
    """[B, T, C] -> [B, 1, 2C] attention-weighted stats (asp.py:9-59)."""

    def __init__(self, channels, attention_channels, global_context=True):
        self.eps = 1e-12
        self.global_context = global_context
        self.tdnn = TDNN(channels * 3 if global_context else channels,
                         attention_channels, 1)
        self.conv = Conv1d(attention_channels, channels, 1)

    def __call__(self, x):
        n, t, c = x.shape
        if self.global_context:
            mean = jnp.mean(x, axis=1, keepdims=True)
            std = jnp.sqrt(jnp.mean((x - mean) ** 2, axis=1, keepdims=True)
                           + self.eps)
            attn = jnp.concatenate([
                x,
                jnp.broadcast_to(mean, x.shape),
                jnp.broadcast_to(std, x.shape),
            ], axis=-1)
        else:
            attn = x
        attn = self.conv(jnp.tanh(self.tdnn(attn)))
        attn = jax.nn.softmax(attn, axis=1)
        mean = jnp.sum(x * attn, axis=1, keepdims=True)
        std = jnp.sqrt(jnp.sum((x - mean) ** 2 * attn, axis=1, keepdims=True)
                       + self.eps)
        return jnp.concatenate([mean, std], axis=-1)


class ECPATDNN(Module):
    def __init__(self, args: ECPATDNNArgs):
        self.args = args
        self.blocks = [
            TDNN(args.input_size, args.channels[0], args.kernel_sizes[0],
                 dilation=args.dilations[0], groups=args.groups[0])
        ] + [
            SeRes2Net(args.channels[i - 1], args.channels[i],
                      scale=args.res2net_scale,
                      attention_channels=args.se_channels,
                      kernel_size=args.kernel_sizes[i],
                      dilation=args.dilations[i], groups=args.groups[i])
            for i in range(1, len(args.channels) - 1)
        ]
        self.mfa = TDNN(args.channels[-2] * (len(args.channels) - 2),
                        args.channels[-1], args.kernel_sizes[-1],
                        dilation=args.dilations[-1], groups=args.groups[-1])
        self.asp = AttentiveStatisticsPooling(
            args.channels[-1], attention_channels=args.attention_channels,
            global_context=args.global_context,
        )
        self.asp_bn = BatchNorm(args.channels[-1] * 2)
        self.fc = Conv1d(args.channels[-1] * 2, args.lin_neurons, 1)

    def __call__(self, x: jax.Array) -> jax.Array:
        """mel [B, T, input_size] -> speaker embedding [B, 1, lin_neurons]."""
        skips = []
        for layer in self.blocks:
            x = layer(x)
            if isinstance(layer, SeRes2Net):
                skips.append(x)
        x = self.mfa(jnp.concatenate(skips, axis=-1))
        x = self.asp_bn(self.asp(x))
        return self.fc(x)
