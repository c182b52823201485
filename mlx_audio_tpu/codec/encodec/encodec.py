"""EnCodec (Meta) — causal streamable SEANet codec with LSTM bottleneck.

Capability parity with /root/reference/mlx_audio/codec/models/encodec/
encodec.py:21-777: causal/asymmetric padded convs (reflect), residual
2-layer unidirectional LSTM, bandwidth-selectable RVQ, chunked processing
with linear overlap-add and per-chunk normalization scales.

TPU-first: NLC layout, the LSTM is a `lax.scan` (the reference ships a
hand-written Metal kernel, encodec.py:90-135 — here XLA fuses the scan),
and the chunk loop is host-side over jitted frames.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.models.base import BaseModelArgs
from mlx_audio_tpu.nn import Module, conv1d, conv_transpose1d
from mlx_audio_tpu.nn.layers import _uniform
from mlx_audio_tpu.nn.recurrent import lstm_scan


@dataclass
class EncodecConfig(BaseModelArgs):
    model_type: str = "encodec"
    audio_channels: int = 1
    num_filters: int = 32
    kernel_size: int = 7
    num_residual_layers: int = 1
    dilation_growth_rate: int = 2
    codebook_size: int = 1024
    codebook_dim: int = 128
    hidden_size: int = 128
    num_lstm_layers: int = 2
    residual_kernel_size: int = 3
    use_causal_conv: bool = True
    normalize: bool = False
    pad_mode: str = "reflect"
    norm_type: str = "weight_norm"
    last_kernel_size: int = 7
    trim_right_ratio: float = 1.0
    compress: int = 2
    upsampling_ratios: Optional[List[int]] = None
    target_bandwidths: Optional[List[float]] = None
    sampling_rate: int = 24000
    chunk_length_s: Optional[float] = None
    overlap: Optional[float] = None


def preprocess_audio(
    raw_audio,
    sampling_rate: int = 24000,
    chunk_length: Optional[int] = None,
    chunk_stride: Optional[int] = None,
):
    """Batch/pad input waveforms -> (inputs [B, T, C], masks [B, T])
    (reference encodec.py:48-87)."""
    if not isinstance(raw_audio, list):
        raw_audio = [raw_audio]
    raw_audio = [np.asarray(x) for x in raw_audio]
    raw_audio = [x[..., None] if x.ndim == 1 else x for x in raw_audio]
    max_length = max(x.shape[0] for x in raw_audio)
    if chunk_length is not None:
        max_length += chunk_length - (max_length % chunk_stride)
    inputs, masks = [], []
    for x in raw_audio:
        length = x.shape[0]
        mask = np.ones((length,), dtype=bool)
        diff = max_length - length
        if diff > 0:
            mask = np.pad(mask, (0, diff))
            x = np.pad(x, ((0, diff), (0, 0)))
        inputs.append(x)
        masks.append(mask)
    return jnp.asarray(np.stack(inputs), dtype=jnp.float32), jnp.asarray(np.stack(masks))


class GroupNorm1(Module):
    """GroupNorm(1, C) over NLC input (48 kHz model's time_group_norm)."""

    def __init__(self, channels: int, eps: float = 1e-5):
        self.eps = eps
        self.weight = jnp.ones((channels,))
        self.bias = jnp.zeros((channels,))

    def __call__(self, x):
        mean = jnp.mean(x, axis=(-2, -1), keepdims=True)
        var = jnp.var(x, axis=(-2, -1), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * self.weight + self.bias


class EncodecConv1d(Module):
    """Conv with EnCodec's causal / asymmetric padding (encodec.py:175-252)."""

    def __init__(self, config: EncodecConfig, in_channels: int, out_channels: int,
                 kernel_size: int, stride: int = 1, dilation: int = 1):
        self.causal = config.use_causal_conv
        self.pad_mode = config.pad_mode
        self.stride = stride
        self.dilation = dilation
        self.ksize_eff = (kernel_size - 1) * dilation + 1
        self.padding_total = kernel_size - stride
        scale = 1.0 / math.sqrt(in_channels * kernel_size)
        self.weight = _uniform((kernel_size, in_channels, out_channels), scale)
        self.bias = jnp.zeros((out_channels,))
        self.norm = GroupNorm1(out_channels) if config.norm_type == "time_group_norm" else None

    def _pad(self, x, left, right):
        mode = "reflect" if self.pad_mode == "reflect" else "constant"
        return jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode=mode)

    def __call__(self, x):
        length = x.shape[1]
        n_frames = (length - self.ksize_eff + self.padding_total) / self.stride + 1
        ideal = (math.ceil(n_frames) - 1) * self.stride + self.ksize_eff - self.padding_total
        extra = ideal - length
        if self.causal:
            x = self._pad(x, self.padding_total, extra)
        else:
            right = self.padding_total // 2
            x = self._pad(x, self.padding_total - right, right + extra)
        y = conv1d(x, self.weight, self.stride, 0, self.dilation) + self.bias
        if self.norm is not None:
            y = self.norm(y)
        return y


class EncodecConvTranspose1d(Module):
    def __init__(self, config: EncodecConfig, in_channels: int, out_channels: int,
                 kernel_size: int, stride: int = 1):
        self.causal = config.use_causal_conv
        self.trim_right_ratio = config.trim_right_ratio
        self.padding_total = kernel_size - stride
        self.stride = stride
        scale = 1.0 / math.sqrt(in_channels * kernel_size)
        self.weight = _uniform((kernel_size, in_channels, out_channels), scale)
        self.bias = jnp.zeros((out_channels,))
        self.norm = GroupNorm1(out_channels) if config.norm_type == "time_group_norm" else None

    def __call__(self, x):
        y = conv_transpose1d(x, self.weight, self.stride, padding=0) + self.bias
        if self.norm is not None:
            y = self.norm(y)
        if self.causal:
            right = math.ceil(self.padding_total * self.trim_right_ratio)
        else:
            right = self.padding_total // 2
        left = self.padding_total - right
        return y[:, left: y.shape[1] - right, :]


class UniLSTM(Module):
    """Unidirectional LSTM with EnCodec's fused single bias (Wx, Wh, bias)."""

    def __init__(self, input_size: int, hidden_size: int):
        self.hidden_size = hidden_size
        self.Wx = jnp.zeros((4 * hidden_size, input_size))
        self.Wh = jnp.zeros((4 * hidden_size, hidden_size))
        self.bias = jnp.zeros((4 * hidden_size,))

    def __call__(self, x):
        x_proj = x @ self.Wx.T + self.bias
        b = x.shape[0]
        h0 = jnp.zeros((b, self.hidden_size), dtype=x.dtype)
        c0 = jnp.zeros((b, self.hidden_size), dtype=x.dtype)
        out, _ = lstm_scan(x_proj, self.Wh, h0, c0)
        return out


class EncodecLSTM(Module):
    def __init__(self, config, dimension):
        self.lstm = [UniLSTM(dimension, dimension) for _ in range(config.num_lstm_layers)]

    def __call__(self, x):
        h = x
        for lstm in self.lstm:
            h = lstm(h)
        return h + x


class Elu(Module):
    def __init__(self):
        pass

    def __call__(self, x):
        return jax.nn.elu(x, alpha=1.0)


class EncodecResnetBlock(Module):
    def __init__(self, config, dim: int, dilations):
        kernel_sizes = (config.residual_kernel_size, 1)
        hidden = dim // config.compress
        block = []
        for i, (k, d) in enumerate(zip(kernel_sizes, dilations)):
            in_chs = dim if i == 0 else hidden
            out_chs = dim if i == len(kernel_sizes) - 1 else hidden
            block.append(Elu())
            block.append(EncodecConv1d(config, in_chs, out_chs, k, dilation=d))
        self.block = block
        self.shortcut = EncodecConv1d(config, dim, dim, kernel_size=1)

    def __call__(self, x):
        residual = x
        for layer in self.block:
            x = layer(x)
        return self.shortcut(residual) + x


class EncodecEncoder(Module):
    def __init__(self, config):
        model = [EncodecConv1d(config, config.audio_channels, config.num_filters,
                               config.kernel_size)]
        scaling = 1
        for ratio in reversed(config.upsampling_ratios):
            cur = scaling * config.num_filters
            for j in range(config.num_residual_layers):
                model.append(EncodecResnetBlock(
                    config, cur, [config.dilation_growth_rate ** j, 1]))
            model.append(Elu())
            model.append(EncodecConv1d(config, cur, cur * 2,
                                       kernel_size=ratio * 2, stride=ratio))
            scaling *= 2
        model.append(EncodecLSTM(config, scaling * config.num_filters))
        model.append(Elu())
        model.append(EncodecConv1d(config, scaling * config.num_filters,
                                   config.hidden_size, config.last_kernel_size))
        self.layers = model

    def __call__(self, x):
        for layer in self.layers:
            x = layer(x)
        return x


class EncodecDecoder(Module):
    def __init__(self, config):
        scaling = int(2 ** len(config.upsampling_ratios))
        model = [EncodecConv1d(config, config.hidden_size,
                               scaling * config.num_filters, config.kernel_size)]
        model.append(EncodecLSTM(config, scaling * config.num_filters))
        for ratio in config.upsampling_ratios:
            cur = scaling * config.num_filters
            model.append(Elu())
            model.append(EncodecConvTranspose1d(config, cur, cur // 2,
                                                kernel_size=ratio * 2, stride=ratio))
            for j in range(config.num_residual_layers):
                model.append(EncodecResnetBlock(
                    config, cur // 2, (config.dilation_growth_rate ** j, 1)))
            scaling //= 2
        model.append(Elu())
        model.append(EncodecConv1d(config, config.num_filters,
                                   config.audio_channels, config.last_kernel_size))
        self.layers = model

    def __call__(self, x):
        for layer in self.layers:
            x = layer(x)
        return x


class EncodecEuclideanCodebook(Module):
    def __init__(self, config):
        self.embed = jnp.zeros((config.codebook_size, config.codebook_dim))

    def encode(self, x):
        """[..., D] -> int codes [...]."""
        flat = x.reshape(-1, x.shape[-1])
        emb = self.embed
        dist = (
            jnp.sum(flat * flat, axis=1, keepdims=True)
            - 2 * flat @ emb.T
            + jnp.sum(emb * emb, axis=1)[None, :]
        )
        return jnp.argmin(dist, axis=-1).reshape(x.shape[:-1]).astype(jnp.int32)

    def decode(self, codes):
        return jnp.take(self.embed, codes, axis=0)


class EncodecVectorQuantization(Module):
    def __init__(self, config):
        self.codebook = EncodecEuclideanCodebook(config)

    def encode(self, x):
        return self.codebook.encode(x)

    def decode(self, codes):
        return self.codebook.decode(codes)


class EncodecResidualVectorQuantizer(Module):
    def __init__(self, config):
        self.codebook_size = config.codebook_size
        hop_length = int(np.prod(config.upsampling_ratios))
        self.frame_rate = math.ceil(config.sampling_rate / hop_length)
        self.num_quantizers = int(
            1000 * config.target_bandwidths[-1] // (self.frame_rate * 10)
        )
        self.layers = [EncodecVectorQuantization(config)
                       for _ in range(self.num_quantizers)]

    def get_num_quantizers_for_bandwidth(self, bandwidth: Optional[float] = None) -> int:
        bw_per_q = math.log2(self.codebook_size) * self.frame_rate
        n = self.num_quantizers
        if bandwidth is not None and bandwidth > 0.0:
            n = int(max(1, math.floor(bandwidth * 1000 / bw_per_q)))
        return n

    def encode(self, embeddings, bandwidth: Optional[float] = None):
        """[B, T, D] -> codes [B, nq, T]."""
        nq = self.get_num_quantizers_for_bandwidth(bandwidth)
        residual = embeddings
        all_indices = []
        for layer in self.layers[:nq]:
            indices = layer.encode(residual)
            residual = residual - layer.decode(indices)
            all_indices.append(indices)
        return jnp.stack(all_indices, axis=1)

    def decode(self, codes):
        """codes [B, nq, T] -> [B, T, D]."""
        out = None
        for i in range(codes.shape[1]):
            q = self.layers[i].decode(codes[:, i])
            out = q if out is None else out + q
        return out


class Encodec(Module):
    def __init__(self, config: Union[EncodecConfig, dict]):
        if isinstance(config, dict):
            config = EncodecConfig.from_dict(config)
        self.config = config
        self.encoder = EncodecEncoder(config)
        self.decoder = EncodecDecoder(config)
        self.quantizer = EncodecResidualVectorQuantizer(config)

    @property
    def chunk_length(self):
        if self.config.chunk_length_s is None:
            return None
        return int(self.config.chunk_length_s * self.config.sampling_rate)

    @property
    def chunk_stride(self):
        if self.config.chunk_length_s is None or self.config.overlap is None:
            return None
        return max(1, int((1.0 - self.config.overlap) * self.chunk_length))

    def _encode_frame(self, x, bandwidth, padding_mask):
        return _encodec_encode_frame_jit(self, x, bandwidth, padding_mask)

    def _encode_frame_impl(self, x, bandwidth, padding_mask):
        scale = None
        if self.config.normalize:
            x = x * padding_mask[..., None]
            mono = jnp.sum(x, axis=2, keepdims=True) / x.shape[2]
            scale = jnp.sqrt(jnp.mean(mono ** 2, axis=1, keepdims=True)) + 1e-8
            x = x / scale
        emb = self.encoder(x)
        codes = self.quantizer.encode(emb, bandwidth)
        return codes, scale

    def encode(self, input_values, padding_mask=None,
               bandwidth: Optional[float] = None):
        """[B, T, C] NLC -> (frames [n_chunks, B, nq, T'], scales)."""
        if bandwidth is None:
            bandwidth = self.config.target_bandwidths[0]
        if bandwidth not in self.config.target_bandwidths:
            raise ValueError(
                f"This model doesn't support the bandwidth {bandwidth}. "
                f"Select one of {self.config.target_bandwidths}."
            )
        _, input_length, channels = input_values.shape
        if channels < 1 or channels > 2:
            raise ValueError(f"Number of audio channels must be 1 or 2, got {channels}")
        chunk_length = self.chunk_length or input_length
        stride = self.chunk_stride or input_length
        if padding_mask is None:
            padding_mask = jnp.ones(input_values.shape[:2], dtype=bool)
        frames, scales = [], []
        step = chunk_length - stride
        # HF EncodecModel.encode chunks the raw (unpadded) waveform and
        # lets the LAST chunk be short; reference-style stride-padded
        # inputs land on the same offsets with a full tail chunk — both
        # conventions are supported
        for offset in range(0, max(input_length - step, 1), stride):
            mask = padding_mask[:, offset: offset + chunk_length]
            frame = input_values[:, offset: offset + chunk_length]
            codes, scale = self._encode_frame(frame, bandwidth, mask)
            frames.append(codes)
            scales.append(scale)
        if len(frames) > 1 and frames[-1].shape[-1] < frames[0].shape[-1]:
            # pad the short tail's CODES so the frames stack (HF
            # last_frame_pad_length semantics; decode recomputes the trim
            # from the padding mask)
            pad = frames[0].shape[-1] - frames[-1].shape[-1]
            frames[-1] = jnp.pad(frames[-1], ((0, 0), (0, 0), (0, pad)))
        return jnp.stack(frames), scales

    @staticmethod
    def _linear_overlap_add(frames: List[jax.Array], stride: int):
        n, frame_length, c = frames[0].shape
        total = stride * (len(frames) - 1) + frames[-1].shape[1]
        t = np.linspace(0, 1, frame_length + 2)[1:-1]
        weight = jnp.asarray(0.5 - np.abs(t - 0.5), dtype=frames[0].dtype)[:, None]
        out = jnp.zeros((n, total, c), dtype=frames[0].dtype)
        sum_w = jnp.zeros((total, 1), dtype=frames[0].dtype)
        offset = 0
        for frame in frames:
            fl = frame.shape[1]
            out = out.at[:, offset: offset + fl].add(weight[:fl] * frame)
            sum_w = sum_w.at[offset: offset + fl].add(weight[:fl])
            offset += stride
        return out / sum_w

    def _decode_frame(self, codes, scale=None):
        return _encodec_decode_frame_jit(self, codes, scale)

    def _decode_frame_impl(self, codes, scale=None):
        emb = self.quantizer.decode(codes)
        out = self.decoder(emb)
        if scale is not None:
            out = out * scale
        return out

    def decode(self, audio_codes, audio_scales, padding_mask=None):
        """frames [n_chunks, B, nq, T'] -> audio [B, T, C]."""
        chunk_length = self.chunk_length
        if chunk_length is None:
            if audio_codes.shape[0] != 1:
                raise ValueError(f"Expected one frame, got {audio_codes.shape[0]}")
            audio_values = self._decode_frame(audio_codes[0], audio_scales[0])
        else:
            frames = list(audio_codes)
            if padding_mask is not None and len(frames) > 1:
                # trim the tail frame's stacking padding (HF
                # last_frame_pad_length): the input's final chunk may have
                # been shorter than chunk_length
                import math as _math

                stride = self.chunk_stride or 1
                hop = int(np.prod(self.config.upsampling_ratios))
                last_samples = (padding_mask.shape[1]
                                - (len(frames) - 1) * stride)
                real_codes = max(1, _math.ceil(last_samples / hop))
                if real_codes < frames[-1].shape[-1]:
                    frames[-1] = frames[-1][..., :real_codes]
            decoded = [self._decode_frame(f, s)
                       for f, s in zip(frames, audio_scales)]
            audio_values = self._linear_overlap_add(decoded, self.chunk_stride or 1)
        if padding_mask is not None and padding_mask.shape[1] < audio_values.shape[1]:
            audio_values = audio_values[:, : padding_mask.shape[1]]
        return audio_values

    def sanitize(self, weights: dict) -> dict:
        """MLX encodec checkpoints: conv.weight [O, K, I] -> [K, I, O];
        convT [O?, K, I] per MLX -> [K, I, O]; collapse .conv. nesting.
        HF-transformers `EncodecModel` checkpoints (facebook/encodec_24khz
        format) are auto-detected and folded via sanitize_hf_encodec."""
        if any(".parametrizations.weight." in k or "weight_ih_l0" in k
               for k in weights):
            return sanitize_hf_encodec(weights)
        out = {}
        for k, v in weights.items():
            v = np.asarray(v)
            k = k.replace(".conv.weight", ".weight").replace(".conv.bias", ".bias")
            if k.endswith(".weight") and v.ndim == 3:
                v = v.transpose(1, 2, 0)
            out[k] = v
        return out

    @classmethod
    def from_pretrained(cls, path_or_repo: str):
        """Load model + audio preprocessor from a checkpoint directory or
        repo — both the HF-transformers facebook/encodec_* layout and
        mlx-community conversions (reference encodec.py:711-738).  Returns
        (model, processor) like the reference."""
        import functools

        from mlx_audio_tpu.codec.loading import (
            fetch_from_hub,
            load_config,
            load_safetensors,
        )
        from mlx_audio_tpu.nn.module import update_arrays

        path = fetch_from_hub(path_or_repo)
        config = EncodecConfig.from_dict(load_config(path))
        model = cls(config)
        weights = load_safetensors(path)
        model = update_arrays(model, model.sanitize(weights), strict=False)
        processor = functools.partial(
            preprocess_audio,
            sampling_rate=config.sampling_rate,
            chunk_length=model.chunk_length,
            chunk_stride=model.chunk_stride,
        )
        return model, processor


def sanitize_hf_encodec(weights: dict) -> dict:
    """Map HF-transformers `EncodecModel` checkpoints to our paths.  Layer
    indexing already matches; what differs: torch weight_norm is stored as
    parametrizations (g, v) and folded here (w = g * v / ||v||, norm over
    all dims but 0), torch LSTM keys split per direction/bias, and conv
    layouts.  Golden parity in tests/test_golden_hf.py."""
    import re

    raw, gs, vs = {}, {}, {}
    for k, v in weights.items():
        v = np.asarray(v)
        if k.endswith(".parametrizations.weight.original0"):
            gs[k[: -len(".parametrizations.weight.original0")]] = v
        elif k.endswith(".parametrizations.weight.original1"):
            vs[k[: -len(".parametrizations.weight.original1")]] = v
        else:
            raw[k] = v
    for base, vmat in vs.items():
        g = gs[base]
        norm = np.sqrt((vmat ** 2).sum(axis=(1, 2), keepdims=True))
        raw[base + ".weight"] = g * vmat / np.maximum(norm, 1e-12)

    # in the decoder, the only bare (non-resblock) dense convs are layer 0
    # and the final layer; every other bare conv is a transposed upsampler
    dec_conv = re.compile(r"decoder\.layers\.(\d+)\.(?:conv\.)?weight$")
    dec_idx = [int(m.group(1)) for k in raw if (m := dec_conv.match(k))]
    last_dec = max(dec_idx) if dec_idx else -1

    lstm_re = re.compile(
        r"(encoder|decoder)\.layers\.(\d+)\.lstm\."
        r"(weight_ih|weight_hh|bias_ih|bias_hh)_l(\d+)$"
    )
    out = {}
    for k, v in raw.items():
        if k.endswith((".codebook.inited", ".codebook.cluster_size",
                       ".codebook.embed_avg")):
            continue
        m = lstm_re.match(k)
        if m:
            side, idx, kind, layer = m.groups()
            base = f"{side}.layers.{idx}.lstm.{layer}."
            if kind == "weight_ih":
                out[base + "Wx"] = v
            elif kind == "weight_hh":
                out[base + "Wh"] = v
            else:  # torch adds bias_ih + bias_hh; ours keeps one bias
                out[base + "bias"] = out.get(base + "bias", 0) + v
            continue
        k = k.replace(".conv.weight", ".weight").replace(".conv.bias", ".bias")
        if k.endswith(".weight") and v.ndim == 3:
            cm = re.match(r"decoder\.layers\.(\d+)\.weight$", k)
            if cm and int(cm.group(1)) not in (0, last_dec):
                v = v.transpose(2, 0, 1)  # convT [I, O, K] -> [K, I, O]
            else:
                v = v.transpose(2, 1, 0)  # conv [O, I, K] -> [K, I, O]
        out[k] = v
    return out


# jitted per-chunk graphs (codec as pytree argument; the host-side chunk
# loop stays in encode/decode — see docs/PERF.md)
import functools as _functools


@_functools.partial(jax.jit, static_argnames=("bandwidth",))
def _encodec_encode_frame_jit(codec, x, bandwidth, padding_mask):
    return codec._encode_frame_impl(x, bandwidth, padding_mask)


@jax.jit
def _encodec_decode_frame_jit(codec, codes, scale):
    return codec._decode_frame_impl(codes, scale)
