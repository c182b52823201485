"""BigVGAN — anti-aliased multi-periodicity vocoder (22-44 kHz).

Capability parity with /root/reference/mlx_audio/codec/models/bigvgan/
(bigvgan.py:29-120, amp.py:10-97, resample.py:17-176, activation.py): AMP
resblocks with Snake/SnakeBeta inside kaiser-windowed 2x up/down sampled
activations.  The anti-aliased resampling is depthwise convolution with a
precomputed kaiser-sinc filter — MXU/VPU-friendly, filters are host
constants.  Used by IndexTTS.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Literal, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.models.base import BaseModelArgs
from mlx_audio_tpu.nn.layers import promote_conv_operands
from mlx_audio_tpu.nn import (
    Module,
    WNConv1d,
    WNConvTranspose1d,
    snake,
    snake_beta,
)


@dataclass
class BigVGANConfig(BaseModelArgs):
    num_mels: int
    upsample_rates: List[int]
    upsample_kernel_sizes: List[int]
    upsample_initial_channel: int
    resblock: str
    resblock_kernel_sizes: List[int]
    resblock_dilation_sizes: List[List[int]]
    activation: str
    snake_logscale: bool
    use_bias_at_final: bool = True
    use_tanh_at_final: bool = True


def kaiser_sinc_filter1d(cutoff: float, half_width: float,
                         kernel_size: int) -> np.ndarray:
    """[kernel_size] kaiser-windowed sinc lowpass (reference resample.py:17)."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    a = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros(kernel_size)
    filt = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    return filt / filt.sum()


class LowPassFilter1d(Module):
    def __init__(self, cutoff=0.5, half_width=0.6, stride: int = 1,
                 padding: bool = True, padding_mode: str = "edge",
                 kernel_size: int = 12):
        self.even = kernel_size % 2 == 0
        self.stride = stride
        self.pad_left = kernel_size // 2 - int(self.even)
        self.pad_right = kernel_size // 2
        self.padding = padding
        self.padding_mode = padding_mode
        self.filter = jnp.asarray(
            kaiser_sinc_filter1d(cutoff, half_width, kernel_size),
            dtype=jnp.float32,
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        """[B, T, C] depthwise lowpass."""
        c = x.shape[-1]
        if self.padding:
            x = jnp.pad(
                x, ((0, 0), (self.pad_left, self.pad_right), (0, 0)),
                mode=self.padding_mode,
            )
        w = jnp.broadcast_to(self.filter[:, None, None], (len(self.filter), 1, c))
        x, w = promote_conv_operands(x, w)
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(self.stride,), padding=((0, 0),),
            dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=c,
        )


class UpSample1d(Module):
    def __init__(self, ratio: int = 2, kernel_size: Optional[int] = None):
        self.ratio = ratio
        self.kernel_size = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
        self.stride = ratio
        self.pad = self.kernel_size // ratio - 1
        self.pad_left = self.pad * self.stride + (self.kernel_size - self.stride) // 2
        self.pad_right = self.pad * self.stride + (self.kernel_size - self.stride + 1) // 2
        self.filter = jnp.asarray(
            kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, self.kernel_size),
            dtype=jnp.float32,
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        x = jnp.pad(x, ((0, 0), (self.pad, self.pad), (0, 0)), mode="edge")
        # depthwise transposed conv: input-dilated conv with flipped kernel
        w = jnp.broadcast_to(self.filter[::-1][:, None, None],
                             (self.kernel_size, 1, c))
        x, w = promote_conv_operands(x, w)
        y = self.ratio * jax.lax.conv_general_dilated(
            x, w, window_strides=(1,),
            padding=((self.kernel_size - 1, self.kernel_size - 1),),
            lhs_dilation=(self.stride,),
            dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=c,
        )
        return y[:, self.pad_left: y.shape[1] - self.pad_right, :]


class DownSample1d(Module):
    def __init__(self, ratio: int = 2, kernel_size: Optional[int] = None):
        ks = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
        self.lowpass = LowPassFilter1d(
            cutoff=0.5 / ratio, half_width=0.6 / ratio, stride=ratio,
            kernel_size=ks,
        )

    def __call__(self, x):
        return self.lowpass(x)


class SnakeAct(Module):
    def __init__(self, channels: int, alpha_logscale: bool = False):
        self.alpha_logscale = alpha_logscale
        init = jnp.zeros((channels,)) if alpha_logscale else jnp.ones((channels,))
        self.alpha = init

    def __call__(self, x):
        return snake(x, self.alpha, alpha_logscale=self.alpha_logscale)


class SnakeBetaAct(Module):
    def __init__(self, channels: int, alpha_logscale: bool = False):
        self.alpha_logscale = alpha_logscale
        init = jnp.zeros((channels,)) if alpha_logscale else jnp.ones((channels,))
        self.alpha = init
        self.beta = init

    def __call__(self, x):
        return snake_beta(x, self.alpha, self.beta,
                          alpha_logscale=self.alpha_logscale)


class Activation1d(Module):
    """Anti-aliased activation: up 2x -> act -> down 2x (resample.py:155-176)."""

    def __init__(self, activation, up_ratio=2, down_ratio=2,
                 up_kernel_size=12, down_kernel_size=12):
        self.act = activation
        self.upsample = UpSample1d(up_ratio, up_kernel_size)
        self.downsample = DownSample1d(down_ratio, down_kernel_size)

    def __call__(self, x):
        return self.downsample(self.act(self.upsample(x)))


def _make_act(channels, activation, logscale):
    core = (SnakeAct(channels, logscale) if activation == "snake"
            else SnakeBetaAct(channels, logscale))
    return Activation1d(core)


class AMPBlock1(Module):
    def __init__(self, channels, snake_logscale, activation, kernel_size=3,
                 dilation=(1, 3, 5)):
        self.convs1 = [
            WNConv1d(channels, channels, kernel_size, stride=1, dilation=d,
                     padding=((kernel_size - 1) * d) // 2)
            for d in dilation
        ]
        self.convs2 = [
            WNConv1d(channels, channels, kernel_size, stride=1, dilation=1,
                     padding=(kernel_size - 1) // 2)
            for _ in dilation
        ]
        self.activations = [
            _make_act(channels, activation, snake_logscale)
            for _ in range(len(dilation) * 2)
        ]

    def __call__(self, x):
        for c1, c2, a1, a2 in zip(self.convs1, self.convs2,
                                  self.activations[::2], self.activations[1::2]):
            x = x + c2(a2(c1(a1(x))))
        return x


class AMPBlock2(Module):
    def __init__(self, channels, snake_logscale, activation, kernel_size=3,
                 dilation=(1, 3, 5)):
        self.convs = [
            WNConv1d(channels, channels, kernel_size, stride=1, dilation=d,
                     padding=((kernel_size - 1) * d) // 2)
            for d in dilation
        ]
        self.activations = [
            _make_act(channels, activation, snake_logscale) for _ in dilation
        ]

    def __call__(self, x):
        for conv, act in zip(self.convs, self.activations):
            x = x + conv(act(x))
        return x


class BigVGAN(Module):
    def __init__(self, config):
        if isinstance(config, dict):
            config = BigVGANConfig.from_dict(config)
        self.config = config
        self.num_kernels = len(config.resblock_kernel_sizes)
        self.num_upsamples = len(config.upsample_rates)
        self.use_tanh_at_final = config.use_tanh_at_final
        ch0 = config.upsample_initial_channel
        self.conv_pre = WNConv1d(config.num_mels, ch0, 7, 1, 3)
        self.ups = [
            [WNConvTranspose1d(ch0 // (2 ** i), ch0 // (2 ** (i + 1)), k,
                               stride=u, padding=(k - u) // 2)]
            for i, (u, k) in enumerate(
                zip(config.upsample_rates, config.upsample_kernel_sizes))
        ]
        block_cls = AMPBlock1 if config.resblock == "1" else AMPBlock2
        self.resblocks = [
            block_cls(ch0 // (2 ** (i + 1)), config.snake_logscale,
                      config.activation, k, d)
            for i in range(len(self.ups))
            for k, d in zip(config.resblock_kernel_sizes,
                            config.resblock_dilation_sizes)
        ]
        final_ch = ch0 // (2 ** len(self.ups))
        self.activation_post = _make_act(final_ch, config.activation,
                                         config.snake_logscale)
        self.conv_post = WNConv1d(final_ch, 1, 7, 1, padding=3,
                                  bias=config.use_bias_at_final)

    def __call__(self, x: jax.Array) -> jax.Array:
        """mel [B, num_mels, T] (NCL, reference contract) -> [B, T*up, 1]."""
        return _bigvgan_forward_jit(self, x)

    def _forward_impl(self, x: jax.Array) -> jax.Array:
        if x.shape[1] == self.config.num_mels and x.shape[-1] != self.config.num_mels:
            x = jnp.swapaxes(x, 1, 2)  # NCL -> NLC
        x = self.conv_pre(x)
        for step in range(self.num_upsamples):
            for up in self.ups[step]:
                x = up(x)
            xs = self.resblocks[step * self.num_kernels](x)
            for idx in range(1, self.num_kernels):
                xs = xs + self.resblocks[step * self.num_kernels + idx](x)
            x = xs / self.num_kernels
        x = self.activation_post(x)
        x = self.conv_post(x)
        if self.use_tanh_at_final:
            return jnp.tanh(x)
        return jnp.clip(x, -1.0, 1.0)

    def sanitize(self, weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            v = np.asarray(v)
            if (k.endswith("weight_v") or k.endswith("weight_g")) and v.ndim == 3:
                v = v.transpose(1, 2, 0)
            if (".alpha" in k or ".beta" in k) and v.ndim > 1:
                v = v.reshape(-1)
            out[k] = v
        return out

    @classmethod
    def from_pretrained(cls, path_or_repo: str) -> "BigVGAN":
        """Load from a checkpoint directory or repo (nvidia/bigvgan_*
        config.json field names match BigVGANConfig)."""
        from mlx_audio_tpu.codec.loading import (
            fetch_from_hub,
            load_config,
            load_safetensors,
        )
        from mlx_audio_tpu.nn.module import update_arrays

        path = fetch_from_hub(path_or_repo)
        model = cls(BigVGANConfig.from_dict(load_config(path)))
        weights = load_safetensors(path)
        return update_arrays(model, model.sanitize(weights), strict=False)


# jitted entry point (model as pytree argument; see docs/PERF.md)


@jax.jit
def _bigvgan_forward_jit(model, x):
    return model._forward_impl(x)
