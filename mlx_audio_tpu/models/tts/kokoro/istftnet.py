"""ISTFTNet decoder for Kokoro — the hot conv stack, TPU-first.

Re-creates the capability of the reference decoder
(/root/reference/mlx_audio/tts/models/kokoro/istftnet.py:341-979): AdaIN-
conditioned HiFiGAN-style generator with harmonic-plus-noise source and an
ISTFT head.  Design differences from the reference:

* NLC layout end to end (no swapaxes pairs around every conv).
* STFT/ISTFT ride the matmul-DFT kernels in dsp.py (MXU) instead of FFT ops.
* Everything is shape-static and mask-aware: callers run the graph at a
  bucketed frame count F and pass per-row valid lengths; instance-norm stats
  and boundary zeros are masked so results equal an exact-length run.
* The phase-unwrap is a cumsum (XLA-native scan).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu import dsp
from mlx_audio_tpu.nn import (
    AdaIN1d,
    Conv1d,
    Identity,
    Linear,
    Module,
    WNConv1d,
    WNConvTranspose1d,
    get_padding,
    interpolate,
    leaky_relu,
)


def length_mask(total_len: int, lengths: Optional[jax.Array]) -> Optional[jax.Array]:
    """[B, total_len] True for valid positions; None passes through."""
    if lengths is None:
        return None
    return jnp.arange(total_len)[None, :] < lengths[:, None]


def apply_mask(x: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    if mask is None:
        return x
    return jnp.where(mask[..., None], x, 0.0)


class AdaINResBlock1(Module):
    """HiFiGAN ResBlock with AdaIN conditioning + Snake activation
    (reference istftnet.py:341-396).  alpha params stored [C] (NLC)."""

    def __init__(self, channels: int, kernel_size: int = 3,
                 dilation: Sequence[int] = (1, 3, 5), style_dim: int = 64):
        self.convs1 = [
            WNConv1d(channels, channels, kernel_size, stride=1,
                     padding=get_padding(kernel_size, d), dilation=d)
            for d in dilation
        ]
        self.convs2 = [
            WNConv1d(channels, channels, kernel_size, stride=1,
                     padding=get_padding(kernel_size, 1), dilation=1)
            for _ in dilation
        ]
        self.adain1 = [AdaIN1d(style_dim, channels) for _ in dilation]
        self.adain2 = [AdaIN1d(style_dim, channels) for _ in dilation]
        self.alpha1 = [jnp.ones((channels,)) for _ in dilation]
        self.alpha2 = [jnp.ones((channels,)) for _ in dilation]

    def __call__(self, x: jax.Array, s: jax.Array,
                 mask: Optional[jax.Array] = None) -> jax.Array:
        for c1, c2, n1, n2, a1, a2 in zip(
            self.convs1, self.convs2, self.adain1, self.adain2,
            self.alpha1, self.alpha2,
        ):
            xt = n1(x, s, mask)
            xt = xt + (1 / a1) * jnp.sin(a1 * xt) ** 2  # Snake1d
            xt = apply_mask(xt, mask)
            xt = c1(xt)
            xt = n2(xt, s, mask)
            xt = xt + (1 / a2) * jnp.sin(a2 * xt) ** 2
            xt = apply_mask(xt, mask)
            xt = c2(xt)
            x = xt + x
        return apply_mask(x, mask)


class AdainResBlk1d(Module):
    """StyleTTS2 AdaIN residual block with optional 2x upsampling
    (reference istftnet.py:825-899)."""

    def __init__(self, dim_in: int, dim_out: int, style_dim: int = 64,
                 upsample: bool = False, dropout_p: float = 0.0):
        self.dim_in = dim_in
        self.do_upsample = upsample
        self.learned_sc = dim_in != dim_out
        self.conv1 = WNConv1d(dim_in, dim_out, 3, stride=1, padding=1)
        self.conv2 = WNConv1d(dim_out, dim_out, 3, stride=1, padding=1)
        self.norm1 = AdaIN1d(style_dim, dim_in)
        self.norm2 = AdaIN1d(style_dim, dim_out)
        if self.learned_sc:
            self.conv1x1 = WNConv1d(dim_in, dim_out, 1, stride=1, padding=0, bias=False)
        if upsample:
            # depthwise transposed conv upsampler (reference pool, :849-851)
            self.pool = WNConvTranspose1d(
                dim_in, dim_in, kernel_size=3, stride=2, padding=1, groups=dim_in
            )
        else:
            self.pool = Identity()

    def _shortcut(self, x):
        if self.do_upsample:
            x = interpolate(x, scale_factor=2, mode="nearest")
        if self.learned_sc:
            x = self.conv1x1(x)
        return x

    def _residual(self, x, s, mask):
        x = self.norm1(x, s, mask)
        x = leaky_relu(x, 0.2)
        if self.do_upsample:
            x = self.pool(x)             # [B, 2L-1, C]
            x = jnp.pad(x, ((0, 0), (1, 0), (0, 0)))  # left-pad 1 -> [B, 2L, C]
        x = self.conv1(x)
        out_mask = mask
        if self.do_upsample and mask is not None:
            out_mask = jnp.repeat(mask, 2, axis=-1)
            x = apply_mask(x, out_mask)
        x = self.norm2(x, s, out_mask)
        x = leaky_relu(x, 0.2)
        x = self.conv2(x)
        return x, out_mask

    def __call__(self, x, s, mask: Optional[jax.Array] = None):
        res, out_mask = self._residual(x, s, mask)
        out = (res + self._shortcut(x)) / math.sqrt(2)
        return apply_mask(out, out_mask)


class TorchSTFT(Module):
    """mag/phase STFT head (reference MLXSTFT, istftnet.py:453-528), batched.

    Layout: [B, frames, bins] (NLC).  inverse() unwraps phase along frames
    (a cumsum) before resynthesis, matching the reference.
    """

    def __init__(self, filter_length=800, hop_length=200, win_length=800,
                 window="hann_periodic"):
        # StyleTTS2's TorchSTFT windows with scipy get_window(fftbins=True)
        # — the PERIODIC hann — for both analysis and synthesis
        self.filter_length = filter_length
        self.hop_length = hop_length
        self.win_length = win_length
        self.window = window

    def transform(self, x: jax.Array):
        """[B, T] -> (magnitude, phase) each [B, frames, bins]."""
        re, im = dsp.stft_realimag(
            x, self.filter_length, self.hop_length, self.win_length,
            self.window, center=True, pad_mode="reflect",
        )
        mag = jnp.sqrt(re * re + im * im + 1e-14)
        phase = jnp.arctan2(im, re)
        return mag, phase

    def inverse(self, magnitude: jax.Array, phase: jax.Array) -> jax.Array:
        """(mag, phase) [B, frames, bins] -> audio [B, T].  Runs f32: the
        phase unwrap is a long cumsum, fatal in bf16."""
        magnitude = magnitude.astype(jnp.float32)
        phase = unwrap(phase.astype(jnp.float32), axis=-2)
        re = magnitude * jnp.cos(phase)
        im = magnitude * jnp.sin(phase)
        spec = jax.lax.complex(re, im)
        # dsp.istft expects [..., bins, frames]
        return dsp.istft(
            jnp.swapaxes(spec, -1, -2), self.hop_length, self.win_length,
            self.window, center=True,
        )


def unwrap(p: jax.Array, axis: int = -1, period: float = 2 * math.pi) -> jax.Array:
    """numpy.unwrap semantics (reference mlx_unwrap, istftnet.py:417-450)."""
    discont = period / 2
    nd = p.ndim
    axis = axis % nd
    sl_after = tuple(slice(1, None) if i == axis else slice(None) for i in range(nd))
    sl_before = tuple(slice(None, -1) if i == axis else slice(None) for i in range(nd))
    dd = p[sl_after] - p[sl_before]
    interval_high = period / 2
    ddmod = dd - period * jnp.floor((dd - (-interval_high)) / period)
    ddmod = jnp.where((jnp.abs(dd - interval_high) < 1e-10) & (dd > 0),
                      interval_high, ddmod)
    ph_correct = ddmod - dd
    ph_correct = jnp.where(jnp.abs(dd) < discont, 0.0, ph_correct)
    pad_shape = list(ph_correct.shape)
    pad_shape[axis] = 1
    padded = jnp.concatenate(
        [jnp.zeros(pad_shape, dtype=p.dtype), ph_correct], axis=axis
    )
    return p + jnp.cumsum(padded, axis=axis)


def _downsample_linear_int_last(x: jax.Array, s: int) -> jax.Array:
    """interpolate(·, scale_factor=1/s, mode='linear') along the LAST axis
    for integer s with L % s == 0, as reshape+slice (no gather).

    Sample position for output i is i*s + 0.5*s - 0.5, i.e. a fixed offset
    inside each length-s block — identical arithmetic to interpolate1d.
    """
    *lead, l = x.shape
    f = l // s
    lo = (s - 1) // 2
    frac = (0.5 * s - 0.5) - lo          # 0.5 for even s, 0.0 for odd
    xr = x.reshape(*lead, f, s)
    if frac == 0.0:
        return xr[..., lo]
    return (1.0 - frac) * xr[..., lo] + frac * xr[..., lo + 1]


def _upsample_linear_int_last(x: jax.Array, s: int) -> jax.Array:
    """interpolate(·, scale_factor=s, mode='linear') along the LAST axis for
    integer s, as broadcast-lerp (no gather).

    Output position m*s + r samples source position m + (r+0.5)/s - 0.5:
    a lerp between x[m-1]/x[m] (first half of the block) or x[m]/x[m+1]
    (second half), with edge-clamped neighbours — identical arithmetic
    (including the boundary behavior) to interpolate1d.
    """
    *lead, f = x.shape
    r = np.arange(s)
    pos = (r + 0.5) / s - 0.5            # [s] fractional source offset
    is_neg = pos < 0
    frac = jnp.asarray(np.where(is_neg, pos + 1.0, pos), dtype=x.dtype)
    x_m1 = jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)
    x_p1 = jnp.concatenate([x[..., 1:], x[..., -1:]], axis=-1)
    neg = jnp.asarray(is_neg)
    lo_val = jnp.where(neg, x_m1[..., None], x[..., None])     # [..., f, s]
    hi_val = jnp.where(neg, x[..., None], x_p1[..., None])
    y = lo_val * (1.0 - frac) + hi_val * frac
    return y.reshape(*lead, f * s)


def _row_normals(key: jax.Array, b: int, shape: tuple) -> jax.Array:
    """Per-row noise: row i draws from fold_in(key, i) with a batch-free
    shape.  Makes every draw independent of the batch size/layout, so (a)
    padding a batch to a data-parallel multiple leaves real rows bit-exact
    and (b) draws stay prefix-stable along L across frame buckets for every
    row (previously only row 0 / batch-1 was)."""
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(b))
    return jax.vmap(lambda k: jax.random.normal(k, shape))(keys)


class SineGen(Module):
    """Harmonic sine source (reference istftnet.py:531-623).

    Internally runs [B, harmonics, L] — the audio-rate math vectorizes over
    L on the minor dim (harmonics-last wasted 119/128 lanes and the phase
    up/downsampling was gather-based; measured ~10% of synthesis time,
    docs/PERF.md)."""

    def __init__(self, samp_rate: int, upsample_scale: int, harmonic_num: int = 0,
                 sine_amp: float = 0.1, noise_std: float = 0.003,
                 voiced_threshold: float = 0.0):
        self.sine_amp = sine_amp
        self.noise_std = noise_std
        self.harmonic_num = harmonic_num
        self.dim = harmonic_num + 1
        self.sampling_rate = samp_rate
        self.voiced_threshold = voiced_threshold
        self.upsample_scale = upsample_scale

    def _f02uv(self, f0):
        return (f0 > self.voiced_threshold).astype(jnp.float32)

    def _f02sine_hl(self, fn, key):
        # fn: [B, H, L].  Phase accumulates in f32 — a bf16 cumsum over
        # 100k+ samples destroys the phase entirely.
        s = self.upsample_scale
        rad = (fn.astype(jnp.float32) / self.sampling_rate) % 1.0
        rand_ini = _row_normals(key, fn.shape[0], (fn.shape[1],))
        rand_ini = rand_ini.at[:, 0].set(0.0)
        rad = rad.at[:, :, 0].add(rand_ini)
        # downsample rad -> frame rate, integrate, upsample phase
        if rad.shape[-1] % s == 0:
            rad_ds = _downsample_linear_int_last(rad, s)
            phase = jnp.cumsum(rad_ds, axis=-1) * 2 * jnp.pi
            phase_us = _upsample_linear_int_last(phase * s, s)
        else:  # non-integer-aligned lengths: gather-based fallback
            rad_ds = jnp.swapaxes(
                interpolate(jnp.swapaxes(rad, 1, 2), scale_factor=1 / s,
                            mode="linear"), 1, 2)
            phase = jnp.cumsum(rad_ds, axis=-1) * 2 * jnp.pi
            phase_us = jnp.swapaxes(
                interpolate(jnp.swapaxes(phase * s, 1, 2), scale_factor=s,
                            mode="linear"), 1, 2)
        return jnp.sin(phase_us).astype(fn.dtype)

    def __call__(self, f0: jax.Array, key: jax.Array):
        """f0: [B, L, 1] at audio rate ->
        (sine_waves [B, H, L], uv [B, L, 1], noise [B, H, L])."""
        k1, k2 = jax.random.split(key)
        harmonics = jnp.arange(1, self.harmonic_num + 2)[None, :, None]
        fn = f0[..., 0][:, None, :] * harmonics          # [B, H, L]
        sine_waves = self._f02sine_hl(fn, k1) * self.sine_amp
        uv = self._f02uv(f0)                             # [B, L, 1]
        uv_hl = uv[..., 0][:, None, :]
        noise_amp = uv_hl * self.noise_std + (1 - uv_hl) * self.sine_amp / 3
        # draw per row in the historical [L, H] layout: prefix-stable across
        # frame buckets (bucketing-exactness contract) and batch-layout-
        # invariant (data-parallel padding contract)
        b, h, l = sine_waves.shape
        noise = noise_amp * jnp.moveaxis(
            _row_normals(k2, b, (l, h)), -1, 1
        )
        sine_waves = sine_waves * uv_hl + noise
        return sine_waves, uv, noise


class SourceModuleHnNSF(Module):
    """Merge harmonics into one excitation (reference istftnet.py:626-680)."""

    def __init__(self, sampling_rate, upsample_scale, harmonic_num=0,
                 sine_amp=0.1, add_noise_std=0.003, voiced_threshod=0.0):
        self.sine_amp = sine_amp
        self.l_sin_gen = SineGen(
            sampling_rate, upsample_scale, harmonic_num, sine_amp,
            add_noise_std, voiced_threshod,
        )
        self.l_linear = Linear(harmonic_num + 1, 1)

    def __call__(self, x: jax.Array, key: jax.Array):
        k1, k2 = jax.random.split(key)
        sine_wavs, uv, _ = self.l_sin_gen(x, k1)          # [B, H, L]
        # harmonic mix: contraction over H (not the 128-lane minor dim)
        mixed = jnp.einsum("bhl,h->bl", sine_wavs,
                           self.l_linear.weight[0]) + self.l_linear.bias[0]
        sine_merge = jnp.tanh(mixed)[..., None]           # [B, L, 1]
        noise = _row_normals(k2, uv.shape[0], uv.shape[1:]) * self.sine_amp / 3
        return sine_merge, noise, uv


class Generator(Module):
    """HiFiGAN-style generator with ISTFT head (reference istftnet.py:696-807)."""

    def __init__(self, style_dim, resblock_kernel_sizes, upsample_rates,
                 upsample_initial_channel, resblock_dilation_sizes,
                 upsample_kernel_sizes, gen_istft_n_fft, gen_istft_hop_size):
        self.num_kernels = len(resblock_kernel_sizes)
        self.num_upsamples = len(upsample_rates)
        self.upsample_rates = list(upsample_rates)
        total_upsample = int(np.prod(upsample_rates)) * gen_istft_hop_size
        self.total_upsample = total_upsample
        self.m_source = SourceModuleHnNSF(
            sampling_rate=24000, upsample_scale=total_upsample,
            harmonic_num=8, voiced_threshod=10,
        )
        self.noise_convs = []
        self.noise_res = []
        self.ups = []
        for i, (u, k) in enumerate(zip(upsample_rates, upsample_kernel_sizes)):
            self.ups.append(
                WNConvTranspose1d(
                    upsample_initial_channel // (2 ** i),
                    upsample_initial_channel // (2 ** (i + 1)),
                    k, stride=u, padding=(k - u) // 2,
                )
            )
        self.resblocks = []
        for i in range(len(self.ups)):
            ch = upsample_initial_channel // (2 ** (i + 1))
            for k, d in zip(resblock_kernel_sizes, resblock_dilation_sizes):
                self.resblocks.append(AdaINResBlock1(ch, k, d, style_dim))
            c_cur = ch
            if i + 1 < len(upsample_rates):
                stride_f0 = int(np.prod(upsample_rates[i + 1:]))
                self.noise_convs.append(
                    Conv1d(gen_istft_n_fft + 2, c_cur,
                           kernel_size=stride_f0 * 2, stride=stride_f0,
                           padding=(stride_f0 + 1) // 2)
                )
                self.noise_res.append(AdaINResBlock1(c_cur, 7, [1, 3, 5], style_dim))
            else:
                self.noise_convs.append(Conv1d(gen_istft_n_fft + 2, c_cur, kernel_size=1))
                self.noise_res.append(AdaINResBlock1(c_cur, 11, [1, 3, 5], style_dim))
        self.post_n_fft = gen_istft_n_fft
        self.conv_post = WNConv1d(ch, gen_istft_n_fft + 2, 7, stride=1, padding=3)
        self.stft = TorchSTFT(
            filter_length=gen_istft_n_fft, hop_length=gen_istft_hop_size,
            win_length=gen_istft_n_fft,
        )

    def __call__(self, x: jax.Array, s: jax.Array, f0: jax.Array,
                 key: jax.Array, lengths: Optional[jax.Array] = None):
        """x: [B, L, C] (L = 2 * asr frames), f0: [B, L] coarse F0 curve,
        lengths: valid L per row (for bucketed execution)."""
        b, l_in, _ = x.shape
        # nearest-upsample F0 to audio rate (reference f0_upsamp, :770):
        # integer-factor nearest == repeat each sample (no gather)
        up = self.total_upsample
        f0_up = jnp.broadcast_to(
            f0[:, :, None], (b, f0.shape[1], up)
        ).reshape(b, f0.shape[1] * up, 1)
        har_source, _, _ = self.m_source(f0_up, key)   # [B, L*up, 1]
        if lengths is not None:
            har_source = apply_mask(
                har_source, length_mask(har_source.shape[1], lengths * self.total_upsample)
            )
        har_spec, har_phase = self.stft.transform(har_source[..., 0])
        # source path runs f32 (phase integrity); join the decoder's dtype here
        har = jnp.concatenate([har_spec, har_phase], axis=-1).astype(x.dtype)

        cur_len = lengths
        hop = self.stft.hop_length
        for i in range(self.num_upsamples):
            x = leaky_relu(x, 0.1)
            x_source = self.noise_convs[i](har)
            stride_out = int(np.prod(self.upsample_rates[: i + 1]))
            if i == self.num_upsamples - 1:
                # final stage runs at STFT frame rate: frames = L*up/hop + 1
                src_mask = (
                    length_mask(x_source.shape[1],
                                cur_len * self.upsample_rates[i] + 1)
                    if cur_len is not None else None
                )
            else:
                src_mask = (
                    length_mask(x_source.shape[1], cur_len * self.upsample_rates[i])
                    if cur_len is not None else None
                )
            x_source = apply_mask(x_source, src_mask)
            x_source = self.noise_res[i](x_source, s, src_mask)

            x = self.ups[i](x)
            if cur_len is not None:
                cur_len = cur_len * self.upsample_rates[i]
            if i == self.num_upsamples - 1:
                x = jnp.pad(x, ((0, 0), (1, 0), (0, 0)))  # reference "reflection_pad"
                # is actually zero padding (istftnet.py:682-689 pads with
                # mx.pad constant 0), so constant matches it exactly
                if cur_len is not None:
                    cur_len = cur_len + 1
            x = apply_mask(x, length_mask(x.shape[1], cur_len) if cur_len is not None else None)
            x = x + x_source

            cur_mask = length_mask(x.shape[1], cur_len) if cur_len is not None else None
            xs = None
            for j in range(self.num_kernels):
                blk = self.resblocks[i * self.num_kernels + j]
                xs = blk(x, s, cur_mask) if xs is None else xs + blk(x, s, cur_mask)
            x = xs / self.num_kernels

        x = leaky_relu(x, 0.01)
        x = self.conv_post(x)
        x = apply_mask(x, cur_mask if lengths is not None else None)
        spec = jnp.exp(x[..., : self.post_n_fft // 2 + 1])
        phase = jnp.sin(x[..., self.post_n_fft // 2 + 1:])
        return self.stft.inverse(spec, phase)


class Decoder(Module):
    """Kokoro decoder: prosody-conditioned encode/decode stack + Generator
    (reference istftnet.py:902-979)."""

    def __init__(self, dim_in, style_dim, dim_out, resblock_kernel_sizes,
                 upsample_rates, upsample_initial_channel,
                 resblock_dilation_sizes, upsample_kernel_sizes,
                 gen_istft_n_fft, gen_istft_hop_size):
        # Widths follow the reference's constants (istftnet.py:917-935):
        # bottleneck = 2 * upsample_initial_channel (1024 for Kokoro-82M),
        # final width = upsample_initial_channel (512), asr residual 64.
        bottleneck = 2 * upsample_initial_channel
        asr_ch = 64
        self.encode = AdainResBlk1d(dim_in + 2, bottleneck, style_dim)
        self.decode = [
            AdainResBlk1d(bottleneck + 2 + asr_ch, bottleneck, style_dim),
            AdainResBlk1d(bottleneck + 2 + asr_ch, bottleneck, style_dim),
            AdainResBlk1d(bottleneck + 2 + asr_ch, bottleneck, style_dim),
            AdainResBlk1d(bottleneck + 2 + asr_ch, upsample_initial_channel,
                          style_dim, upsample=True),
        ]
        self.F0_conv = WNConv1d(1, 1, kernel_size=3, stride=2, padding=1)
        self.N_conv = WNConv1d(1, 1, kernel_size=3, stride=2, padding=1)
        self.asr_res = [WNConv1d(dim_in, asr_ch, kernel_size=1, padding=0)]
        self.generator = Generator(
            style_dim, resblock_kernel_sizes, upsample_rates,
            upsample_initial_channel, resblock_dilation_sizes,
            upsample_kernel_sizes, gen_istft_n_fft, gen_istft_hop_size,
        )

    def __call__(self, asr: jax.Array, f0_curve: jax.Array, n_curve: jax.Array,
                 s: jax.Array, key: jax.Array,
                 frame_lengths: Optional[jax.Array] = None):
        """asr: [B, F, 512]; f0/n curves: [B, 2F]; s: [B, 128];
        frame_lengths: valid F per row.  Returns audio [B, 600*F]."""
        mask = length_mask(asr.shape[1], frame_lengths) if frame_lengths is not None else None
        f0 = self.F0_conv(f0_curve[..., None])  # [B, F, 1]
        n = self.N_conv(n_curve[..., None])
        x = jnp.concatenate([asr, f0, n], axis=-1)
        x = self.encode(x, s, mask)
        asr_res = self.asr_res[0](asr)
        res = True
        for block in self.decode:
            if res:
                x = jnp.concatenate([x, asr_res, f0, n], axis=-1)
            x = block(x, s, mask)
            if block.do_upsample:
                res = False
                mask = jnp.repeat(mask, 2, axis=-1) if mask is not None else None
        audio = self.generator(
            x, s, f0_curve, key,
            lengths=frame_lengths * 2 if frame_lengths is not None else None,
        )
        return audio
