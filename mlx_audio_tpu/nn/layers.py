"""Shared neural building blocks (layer 2 of SURVEY.md §1).

The reference re-implements convs/norms/activations inside every model family
(e.g. kokoro/istftnet.py:53-338, codec/models/descript/nn/layers.py,
codec/models/bigvgan/conv.py); here they are centralized once.

Conventions (TPU-first):

* **Channels-last everywhere.**  All 1-D sequence ops take ``[batch, length,
  channels]`` (NLC) — the layout XLA tiles best on TPU — so there are no
  layout swaps between layers.  Checkpoint weights in torch's NCL layouts are
  transposed once at load time.
* Modules are pytrees (see module.py); calls are pure.
* Weight-normalized convs keep (v, g) separate and normalize at call time,
  matching the reference semantics (istftnet.py:53-93) so checkpoints load
  unchanged; XLA constant-folds the normalization per step.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.nn.module import Module

_INIT_RNG = np.random.default_rng(0)


def _uniform(shape, scale):
    return jnp.asarray(
        _INIT_RNG.uniform(-scale, scale, size=shape), dtype=jnp.float32
    )


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


def promote_conv_operands(x: jax.Array, w: jax.Array):
    """Promote mixed dtypes like jnp.matmul does — conv_general_dilated
    errors on a mismatch instead.  Mixed f32-input/bf16-weight graphs run
    in f32; cast inputs to the weight dtype for a true bf16 pass."""
    if x.dtype != w.dtype:
        dt = jnp.promote_types(x.dtype, w.dtype)
        return x.astype(dt), w.astype(dt)
    return x, w


# ---------------------------------------------------------------------------
# Dense / embedding
# ---------------------------------------------------------------------------


class Linear(Module):
    """y = x @ W^T + b with torch-layout weight [out, in] for easy loading."""

    def __init__(self, in_dim: int, out_dim: int, bias: bool = True):
        scale = 1.0 / math.sqrt(in_dim)
        self.weight = _uniform((out_dim, in_dim), scale)
        self.bias = _uniform((out_dim,), scale) if bias else None

    def __call__(self, x: jax.Array) -> jax.Array:
        y = x @ self.weight.T
        if self.bias is not None:
            y = y + self.bias
        return y


class Embedding(Module):
    def __init__(self, num_embeddings: int, dim: int):
        self.weight = _uniform((num_embeddings, dim), 1.0)

    def __call__(self, ids: jax.Array) -> jax.Array:
        return jnp.take(self.weight, ids, axis=0)

    def as_linear(self, x: jax.Array) -> jax.Array:
        """Tied-embedding output projection."""
        return x @ self.weight.T


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------


class LayerNorm(Module):
    def __init__(self, dim: int, eps: float = 1e-5, affine: bool = True):
        self.eps = eps
        self.weight = jnp.ones((dim,)) if affine else None
        self.bias = jnp.zeros((dim,)) if affine else None

    def __call__(self, x: jax.Array) -> jax.Array:
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        if self.weight is not None:
            y = y * self.weight + self.bias
        return y


class RMSNorm(Module):
    def __init__(self, dim: int, eps: float = 1e-5):
        self.eps = eps
        self.weight = jnp.ones((dim,))

    def __call__(self, x: jax.Array) -> jax.Array:
        # Normalize in f32 for stability under bf16 activations.
        xf = x.astype(jnp.float32)
        y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        return (y * self.weight).astype(x.dtype)


class BatchNorm(Module):
    """Inference-mode batch norm over the channel (last) axis of NLC input,
    using running statistics."""

    def __init__(self, num_features: int, eps: float = 1e-5):
        self.eps = eps
        self.weight = jnp.ones((num_features,))
        self.bias = jnp.zeros((num_features,))
        self.running_mean = jnp.zeros((num_features,))
        self.running_var = jnp.ones((num_features,))

    def __call__(self, x: jax.Array) -> jax.Array:
        y = (x - self.running_mean) * jax.lax.rsqrt(self.running_var + self.eps)
        return y * self.weight + self.bias


class InstanceNorm1d(Module):
    """Instance norm over the time axis of NLC input (reference
    istftnet.py:173-325 operates NCL; semantics are identical)."""

    def __init__(self, num_features: int, eps: float = 1e-5, affine: bool = False):
        self.eps = eps
        self.weight = jnp.ones((num_features,)) if affine else None
        self.bias = jnp.zeros((num_features,)) if affine else None

    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        # x: [B, L, C]; stats per (batch, channel) over L.  ``mask`` [B, L]
        # (True = valid) makes stats exact when L is padded to a bucket.
        # Stats accumulate in f32: bf16 sums over 100k+ timesteps lose the
        # mean entirely (8-bit mantissa).
        xf = x.astype(jnp.float32)
        if mask is None:
            mean = jnp.mean(xf, axis=-2, keepdims=True)
            var = jnp.var(xf, axis=-2, keepdims=True)
        else:
            m = mask[..., None].astype(jnp.float32)
            count = jnp.maximum(jnp.sum(m, axis=-2, keepdims=True), 1.0)
            mean = jnp.sum(xf * m, axis=-2, keepdims=True) / count
            var = jnp.sum((xf - mean) ** 2 * m, axis=-2, keepdims=True) / count
        y = ((xf - mean) * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)
        if self.weight is not None:
            y = y * self.weight + self.bias
        return y


class AdaIN1d(Module):
    """Style-conditioned instance norm (istftnet.py:327-338), NLC layout."""

    def __init__(self, style_dim: int, num_features: int):
        self.norm = InstanceNorm1d(num_features, affine=False)
        self.fc = Linear(style_dim, num_features * 2)

    def __call__(self, x: jax.Array, s: jax.Array,
                 mask: Optional[jax.Array] = None) -> jax.Array:
        h = self.fc(s)  # [B, 2C]
        gamma, beta = jnp.split(h, 2, axis=-1)
        return (1 + gamma[:, None, :]) * self.norm(x, mask) + beta[:, None, :]


class AdaLayerNorm(Module):
    """Style-conditioned layer norm (kokoro/modules.py:71-90), NLC layout."""

    def __init__(self, style_dim: int, channels: int, eps: float = 1e-5):
        self.eps = eps
        self.fc = Linear(style_dim, channels * 2)

    def __call__(self, x: jax.Array, s: jax.Array) -> jax.Array:
        h = self.fc(s)  # [B, 2C]
        gamma, beta = jnp.split(h, 2, axis=-1)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return (1 + gamma[:, None, :]) * y + beta[:, None, :]


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------


def leaky_relu(x: jax.Array, negative_slope: float = 0.01) -> jax.Array:
    return jnp.where(x > 0, x, x * negative_slope)


def snake(x: jax.Array, alpha: jax.Array, alpha_logscale: bool = False) -> jax.Array:
    """Snake activation ``x + sin^2(ax)/a`` (istftnet.py:382; bigvgan
    activation.py:5)."""
    if alpha_logscale:
        alpha = jnp.exp(alpha)
    s = jnp.sin(alpha * x)
    return x + s * s / (alpha + 1e-9)


def snake_beta(x: jax.Array, alpha: jax.Array, beta: jax.Array,
               alpha_logscale: bool = True) -> jax.Array:
    """SnakeBeta: ``x + sin^2(ax)/b`` (bigvgan activation.py:27)."""
    if alpha_logscale:
        alpha, beta = jnp.exp(alpha), jnp.exp(beta)
    s = jnp.sin(alpha * x)
    return x + s * s / (beta + 1e-9)


# ---------------------------------------------------------------------------
# Convolutions (NLC)
# ---------------------------------------------------------------------------

_DN_CONV1D = ("NWC", "WIO", "NWC")


def _dilated_conv1d_decomposed(x: jax.Array, weight: jax.Array,
                               dilation: int) -> jax.Array:
    """'Same'-padded dilated conv as a DENSE conv over residue streams.

    t = q*d + r: neighbors at distance d are consecutive within stream r, so
    folding the d residue streams into the batch turns rhs_dilation=d into a
    dense k-tap conv (exact, including the zero-padding at both ends).
    Opt-in via MLX_AUDIO_TPU_DECOMP_CONV=1 (perf A/B; docs/PERF.md)."""
    b, l, c = x.shape
    k = weight.shape[0]
    d = dilation
    lp = -(-l // d) * d
    xp = jnp.pad(x, ((0, 0), (0, lp - l), (0, 0)))
    xs = xp.reshape(b, lp // d, d, c).transpose(0, 2, 1, 3)
    xs = xs.reshape(b * d, lp // d, c)
    pad = (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        xs, weight, window_strides=(1,), padding=((pad, pad),),
        dimension_numbers=_DN_CONV1D,
    )
    y = y.reshape(b, d, lp // d, -1).transpose(0, 2, 1, 3).reshape(b, lp, -1)
    return y[:, :l]


def _dilated_conv1d_residue(x: jax.Array, weight: jax.Array, dilation: int,
                            dense_conv) -> jax.Array:
    """'Same' dilated conv via the residue-stream fold (see
    _dilated_conv1d_decomposed) with a pluggable dense-conv implementation
    (the Pallas banded kernel)."""
    b, l, c = x.shape
    d = dilation
    lp = -(-l // d) * d
    xp = jnp.pad(x, ((0, 0), (0, lp - l), (0, 0)))
    xs = xp.reshape(b, lp // d, d, c).transpose(0, 2, 1, 3)
    xs = xs.reshape(b * d, lp // d, c)
    y = dense_conv(xs, weight)
    y = y.reshape(b, d, lp // d, -1).transpose(0, 2, 1, 3).reshape(b, lp, -1)
    return y[:, :l]


def use_decomp_conv() -> bool:
    from mlx_audio_tpu.nn.pallas_ops import _env_on

    return _env_on("MLX_AUDIO_TPU_DECOMP_CONV")


def conv1d(
    x: jax.Array,
    weight: jax.Array,
    stride: int = 1,
    padding: Union[int, tuple[int, int]] = 0,
    dilation: int = 1,
    groups: int = 1,
) -> jax.Array:
    """Functional conv over NLC input with weight [k, in_ch/groups, out_ch]."""
    if isinstance(padding, int):
        padding = (padding, padding)
    x, weight = promote_conv_operands(x, weight)
    k = weight.shape[0]
    span = (k - 1) * dilation
    if (stride == 1 and groups == 1 and k > 1 and k % 2 == 1
            and padding == (span // 2, span // 2) and x.ndim == 3):
        # banded-matmul Pallas path: dense K>=5 'same' convs (dilated folds
        # to dense via the exact residue-stream decomposition first) run as
        # aligned MXU matmuls — beats XLA's ~23%-MXU conv emitter on the
        # ISTFTNet/BigVGAN resblock shapes (docs/PERF.md)
        from mlx_audio_tpu.nn.pallas_ops import (
            banded_conv1d_pallas,
            banded_conv_supported,
            use_banded_conv,
        )

        if use_banded_conv() and banded_conv_supported(
            k, weight.shape[1], weight.shape[2],
            x.shape[1] // max(dilation, 1), x.dtype.itemsize,
        ):
            if dilation == 1:
                return banded_conv1d_pallas(x, weight)
            return _dilated_conv1d_residue(x, weight, dilation,
                                           banded_conv1d_pallas)
    if (stride == 1 and groups == 1 and k > 1 and k % 2 == 1
            and dilation > 1 and padding == (span // 2, span // 2)
            and x.ndim == 3 and use_decomp_conv()):
        return _dilated_conv1d_decomposed(x, weight, dilation)
    if (stride == 1 and groups == 1 and k > 1 and k % 2 == 1
            and padding == (span // 2, span // 2)
            and x.ndim == 3 and x.shape[1] >= 2048
            and weight.shape[1] % 128 == 0 and weight.shape[2] % 128 == 0
            and k * weight.shape[1] * weight.shape[2] * x.dtype.itemsize
            <= 8 * 1024 * 1024):
        # long 'same' dilated convs run as K shifted MXU matmuls — XLA's
        # conv emitter measured ~23% MXU on these (docs/PERF.md)
        from mlx_audio_tpu.nn.pallas_ops import (
            dilated_conv1d_pallas,
            use_pallas_conv,
        )

        if use_pallas_conv():
            return dilated_conv1d_pallas(x, weight, dilation)
    return jax.lax.conv_general_dilated(
        x,
        weight,
        window_strides=(stride,),
        padding=(padding,),
        rhs_dilation=(dilation,),
        dimension_numbers=_DN_CONV1D,
        feature_group_count=groups,
    )


def conv_transpose1d(
    x: jax.Array,
    weight: jax.Array,
    stride: int = 1,
    padding: int = 0,
    output_padding: int = 0,
    groups: int = 1,
) -> jax.Array:
    """Transposed conv over NLC input, torch-compatible semantics.

    ``weight`` is [k, out_ch/groups?, ...] — we use [k, in, out] and express
    the transpose as an input-dilated regular conv with a flipped kernel,
    which is exactly what torch's ConvTranspose1d computes and lowers cleanly
    to the MXU.
    """
    if groups != 1:
        raise NotImplementedError("use depthwise_conv_transpose1d for groups > 1")
    k = weight.shape[0]
    pad_lo = k - 1 - padding
    pad_hi = k - 1 - padding + output_padding
    # flip taps; weight [k, in, out] is already the rhs layout for the
    # equivalent input-dilated forward conv
    w = jnp.flip(weight, axis=0)
    x, w = promote_conv_operands(x, w)
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=((pad_lo, pad_hi),),
        lhs_dilation=(stride,),
        dimension_numbers=_DN_CONV1D,
    )


class Conv1d(Module):
    """Standard conv, weight stored [k, in/groups, out] (NLC rhs layout)."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: int,
        stride: int = 1,
        padding: int = 0,
        dilation: int = 1,
        groups: int = 1,
        bias: bool = True,
    ):
        self.stride = stride
        self.padding = padding
        self.dilation = dilation
        self.groups = groups
        scale = 1.0 / math.sqrt(in_channels * kernel_size / groups)
        self.weight = _uniform((kernel_size, in_channels // groups, out_channels), scale)
        self.bias = _uniform((out_channels,), scale) if bias else None

    def __call__(self, x: jax.Array) -> jax.Array:
        y = conv1d(x, self.weight, self.stride, self.padding, self.dilation, self.groups)
        if self.bias is not None:
            y = y + self.bias
        return y


class Conv2d(Module):
    """2-D conv over NHWC inputs, weight stored [kh, kw, in/groups, out]
    (torch checkpoints [out, in, kh, kw] transpose with (2, 3, 1, 0))."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size,
        stride=1,
        padding=0,
        dilation=1,
        groups: int = 1,
        bias: bool = True,
    ):
        kh, kw = ((kernel_size, kernel_size)
                  if isinstance(kernel_size, int) else kernel_size)
        self.stride = (stride, stride) if isinstance(stride, int) else tuple(stride)
        self.padding = ((padding, padding)
                        if isinstance(padding, int) else tuple(padding))
        self.dilation = ((dilation, dilation)
                         if isinstance(dilation, int) else tuple(dilation))
        self.groups = groups
        scale = 1.0 / math.sqrt(in_channels * kh * kw / groups)
        self.weight = _uniform((kh, kw, in_channels // groups, out_channels), scale)
        self.bias = _uniform((out_channels,), scale) if bias else None

    def __call__(self, x: jax.Array) -> jax.Array:
        x, w = promote_conv_operands(x, self.weight)
        ph, pw = self.padding
        y = jax.lax.conv_general_dilated(
            x, w,
            window_strides=self.stride,
            padding=((ph, ph), (pw, pw)),
            rhs_dilation=self.dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )
        if self.bias is not None:
            y = y + self.bias
        return y


class ConvTranspose1d(Module):
    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: int,
        stride: int = 1,
        padding: int = 0,
        output_padding: int = 0,
        groups: int = 1,
        bias: bool = True,
    ):
        self.stride = stride
        self.padding = padding
        self.output_padding = output_padding
        self.groups = groups
        scale = 1.0 / math.sqrt(in_channels * kernel_size / groups)
        if groups == 1:
            # stored [k, in, out] (torch layout [in, out, k] transposed)
            self.weight = _uniform((kernel_size, in_channels, out_channels), scale)
        else:
            if in_channels != out_channels or in_channels != groups:
                raise NotImplementedError("grouped convT supports depthwise only")
            self.weight = _uniform((kernel_size, in_channels, 1), scale)
        self.bias = _uniform((out_channels,), scale) if bias else None

    def __call__(self, x: jax.Array) -> jax.Array:
        if self.groups == 1:
            y = conv_transpose1d(
                x, self.weight, self.stride, self.padding, self.output_padding
            )
        else:
            y = depthwise_conv_transpose1d(
                x, self.weight, self.stride, self.padding, self.output_padding
            )
        if self.bias is not None:
            y = y + self.bias
        return y


def depthwise_conv_transpose1d(
    x: jax.Array, weight: jax.Array, stride: int, padding: int, output_padding: int = 0
) -> jax.Array:
    """Depthwise transposed conv: weight [k, C, 1], NLC input."""
    k = weight.shape[0]
    pad_lo = k - 1 - padding
    pad_hi = k - 1 - padding + output_padding
    # stored [k, C, 1] -> rhs [k, in/groups=1, out=C]
    w = jnp.swapaxes(jnp.flip(weight, axis=0), 1, 2)
    x, w = promote_conv_operands(x, w)
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=((pad_lo, pad_hi),),
        lhs_dilation=(stride,),
        dimension_numbers=_DN_CONV1D,
        feature_group_count=x.shape[-1],
    )


def weight_norm(weight_v: jax.Array, weight_g: jax.Array) -> jax.Array:
    """w = g * v / ||v||, norm over all axes except the out-channel axis.

    Our conv rhs layout is [k, in, out]; out-channel is axis -1, so the norm
    reduces over (0, 1).  Matches reference istftnet.py:53-93 (dim=0 on
    [out, k, in] — same channels, different layout).
    """
    norm = jnp.sqrt(jnp.sum(weight_v * weight_v, axis=(0, 1), keepdims=True))
    return weight_v / (norm + 1e-7) * weight_g


class WNConv1d(Module):
    """Weight-normalized conv1d (reference ConvWeighted, istftnet.py:96-170).

    weight_v: [k, in/groups, out]; weight_g: [1, 1, out].
    """

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: int,
        stride: int = 1,
        padding: int = 0,
        dilation: int = 1,
        groups: int = 1,
        bias: bool = True,
    ):
        self.stride = stride
        self.padding = padding
        self.dilation = dilation
        self.groups = groups
        scale = 1.0 / math.sqrt(in_channels * kernel_size / groups)
        v = _uniform((kernel_size, in_channels // groups, out_channels), scale)
        self.weight_v = v
        # g = ||v|| so that w == v at init (torch weight_norm convention)
        self.weight_g = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True))
        self.bias = jnp.zeros((out_channels,)) if bias else None

    def __call__(self, x: jax.Array) -> jax.Array:
        w = weight_norm(self.weight_v, self.weight_g)
        y = conv1d(x, w, self.stride, self.padding, self.dilation, self.groups)
        if self.bias is not None:
            y = y + self.bias
        return y


class WNConvTranspose1d(Module):
    """Weight-normalized transposed conv1d (NLC).

    weight_v: [k, in, out] (groups=1) or [k, C, 1] (depthwise).  NB: torch
    weight-norm on ConvTranspose (dim=0 over its [in, out, k] layout) puts
    both the norm and ``g`` on the *input*-channel axis — reproduced here so
    checkpoints load unchanged (cf. reference istftnet.py:119-130 where
    ConvWeighted's "out_channels" arg is the convT input dim).
    """

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: int,
        stride: int = 1,
        padding: int = 0,
        output_padding: int = 0,
        groups: int = 1,
        bias: bool = True,
    ):
        self.stride = stride
        self.padding = padding
        self.output_padding = output_padding
        self.groups = groups
        scale = 1.0 / math.sqrt(in_channels * kernel_size / groups)
        if groups == 1:
            self.weight_v = _uniform((kernel_size, in_channels, out_channels), scale)
        else:
            if in_channels != out_channels or in_channels != groups:
                raise NotImplementedError("grouped convT supports depthwise only")
            self.weight_v = _uniform((kernel_size, in_channels, 1), scale)
        self.weight_g = jnp.sqrt(
            jnp.sum(self.weight_v * self.weight_v, axis=(0, 2), keepdims=True)
        )
        self.bias = jnp.zeros((out_channels,)) if bias else None

    def __call__(self, x: jax.Array) -> jax.Array:
        norm = jnp.sqrt(
            jnp.sum(self.weight_v * self.weight_v, axis=(0, 2), keepdims=True)
        )
        w = self.weight_v / (norm + 1e-7) * self.weight_g
        if self.groups == 1:
            y = conv_transpose1d(x, w, self.stride, self.padding, self.output_padding)
        else:
            y = depthwise_conv_transpose1d(
                x, w, self.stride, self.padding, self.output_padding
            )
        if self.bias is not None:
            y = y + self.bias
        return y


# ---------------------------------------------------------------------------
# Misc
# ---------------------------------------------------------------------------


class Identity(Module):
    def __init__(self):
        pass

    def __call__(self, x, *a, **k):
        return x


def zero_pad_time(x: jax.Array, pad: tuple[int, int]) -> jax.Array:
    """Zero-pad the time (second-to-last) axis of NLC input."""
    cfg = [(0, 0)] * x.ndim
    cfg[-2] = pad
    return jnp.pad(x, cfg)
