"""S3 / S3TokenizerV2 — speech semantic tokenizer (CosyVoice lineage).

Capability parity with /root/reference/mlx_audio/codec/models/s3/
(model.py:31-262, model_v2.py:24-360, utils.py): Whisper-style conv+
transformer encoder over 128-mel features; v1 quantizes with an
L2-normalized Euclidean codebook, v2 with FSQ (3^8 levels) plus FSMN
memory convs in attention and rotary positions.  NLC layout throughout.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu import dsp
from mlx_audio_tpu.nn import Conv1d, LayerNorm, Linear, Module


@dataclass
class S3Config:
    n_mels: int = 128
    n_audio_ctx: int = 1500
    n_audio_state: int = 1280
    n_audio_head: int = 20
    n_audio_layer: int = 6
    n_codebook_size: int = 4096


def log_mel_spectrogram(audio, sample_rate: int = 16_000, n_mels: int = 128,
                        n_fft: int = 400, hop_length: int = 160,
                        padding: int = 0) -> jax.Array:
    """[T] -> [n_mels, frames] (reference s3/utils.py:9-43; periodic hann,
    slaney mel, whisper-style log compression)."""
    audio = jnp.asarray(audio, dtype=jnp.float32)
    if padding > 0:
        audio = jnp.pad(audio, (0, padding))
    window = dsp._window_np("hann", n_fft + 1)[:-1]
    re, im = dsp.stft_realimag(audio, n_fft, hop_length, n_fft,
                               jnp.asarray(window, jnp.float32), center=True)
    mag2 = re * re + im * im  # [frames, bins]
    fb = dsp.mel_filters(sample_rate, n_fft, n_mels, norm="slaney",
                         mel_scale="slaney")
    mel = mag2 @ fb.T  # [frames, n_mels]
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).T  # [n_mels, frames]


def make_non_pad_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    return jnp.arange(max_len)[None, :] < lengths[:, None]


def sinusoids(length: int, channels: int, max_timescale: float = 10000) -> np.ndarray:
    log_inc = np.log(max_timescale) / (channels // 2 - 1)
    inv = np.exp(-log_inc * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1)


class S3Attention(Module):
    """Whisper-layout attention, optionally with rotary positions and an
    FSMN memory conv on values (v2, model_v2.py:127-216)."""

    def __init__(self, n_state: int, n_head: int, fsmn_kernel: Optional[int] = None):
        self.n_head = n_head
        self.head_dim = n_state // n_head
        self.query = Linear(n_state, n_state)
        self.key = Linear(n_state, n_state, bias=False)
        self.value = Linear(n_state, n_state)
        self.out = Linear(n_state, n_state)
        if fsmn_kernel is not None:
            self.fsmn_block = Conv1d(n_state, n_state, fsmn_kernel, stride=1,
                                     padding=0, groups=n_state, bias=False)
            self.fsmn_left = (fsmn_kernel - 1) // 2
            self.fsmn_right = fsmn_kernel - 1 - self.fsmn_left
        else:
            self.fsmn_block = None

    def _fsmn(self, v_flat, mask_pad):
        x = v_flat
        if mask_pad is not None:
            x = x * mask_pad
        xp = jnp.pad(x, ((0, 0), (self.fsmn_left, self.fsmn_right), (0, 0)))
        y = self.fsmn_block(xp) + x
        if mask_pad is not None:
            y = y * mask_pad
        return y

    def __call__(self, x, mask=None, mask_pad=None, rope=None):
        b, t, d = x.shape
        q = self.query(x)
        k = self.key(x)
        v = self.value(x)

        def split(z):
            return z.reshape(b, t, self.n_head, self.head_dim)

        qh, kh, vh = split(q), split(k), split(v)
        if rope is not None:
            cos, sin = rope
            c = cos[:t][None, :, None, :]
            s = sin[:t][None, :, None, :]
            def rot(z):
                z1, z2 = jnp.split(z, 2, axis=-1)
                return z * c + jnp.concatenate([-z2, z1], axis=-1) * s
            qh, kh = rot(qh), rot(kh)

        fsm_memory = 0.0
        if self.fsmn_block is not None:
            fsm_memory = self._fsmn(vh.reshape(b, t, d), mask_pad)

        qh = qh.transpose(0, 2, 1, 3)
        kh = kh.transpose(0, 2, 1, 3)
        vh = vh.transpose(0, 2, 1, 3)
        scale = self.head_dim ** -0.5
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh).astype(jnp.float32) * scale
        if mask is not None:
            scores = scores + mask
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
        return self.out(out) + fsm_memory


class S3Block(Module):
    def __init__(self, n_state: int, n_head: int, fsmn_kernel: Optional[int] = None,
                 ln_eps: float = 1e-5):
        self.attn = S3Attention(n_state, n_head, fsmn_kernel)
        self.attn_ln = LayerNorm(n_state, eps=1e-6 if fsmn_kernel else ln_eps)
        self.mlp1 = Linear(n_state, n_state * 4)
        self.mlp2 = Linear(n_state * 4, n_state)
        self.mlp_ln = LayerNorm(n_state)

    def __call__(self, x, mask=None, mask_pad=None, rope=None):
        x = x + self.attn(self.attn_ln(x), mask, mask_pad, rope)
        x = x + self.mlp2(jax.nn.gelu(self.mlp1(self.mlp_ln(x)), approximate=False))
        return x


class S3Encoder(Module):
    def __init__(self, cfg: S3Config, stride: int, v2: bool = False):
        self.stride = stride
        self.v2 = v2
        self.conv1 = Conv1d(cfg.n_mels, cfg.n_audio_state, 3, stride=stride, padding=1)
        self.conv2 = Conv1d(cfg.n_audio_state, cfg.n_audio_state, 3, stride=2, padding=1)
        if v2:
            # 64 for the published 1280/20-head model (model_v2.py:278)
            head_dim = cfg.n_audio_state // cfg.n_audio_head
            inv = 1.0 / (10000 ** (np.arange(0, head_dim, 2) / head_dim))
            t = np.arange(2048)
            fr = np.outer(t, inv)
            self.rope_cos = jnp.asarray(np.concatenate([np.cos(fr)] * 2, axis=-1),
                                        jnp.float32)
            self.rope_sin = jnp.asarray(np.concatenate([np.sin(fr)] * 2, axis=-1),
                                        jnp.float32)
            self.positional_embedding = None
        else:
            self.positional_embedding = jnp.asarray(
                sinusoids(cfg.n_audio_ctx, cfg.n_audio_state), jnp.float32
            )
        self.blocks = [
            S3Block(cfg.n_audio_state, cfg.n_audio_head,
                    fsmn_kernel=31 if v2 else None)
            for _ in range(cfg.n_audio_layer)
        ]

    def __call__(self, mel: jax.Array, mel_len: jax.Array):
        """mel [B, n_mels, T] (NCL contract) -> (hidden [B, T', D], T'_len)."""
        x = jnp.swapaxes(mel, 1, 2)
        t = x.shape[1]
        mask = make_non_pad_mask(mel_len, t)[..., None]
        x = jax.nn.gelu(self.conv1(x * mask), approximate=False)
        x_len = (mel_len + 2 - 2 - 1) // self.stride + 1
        mask = make_non_pad_mask(x_len, x.shape[1])[..., None]
        x = jax.nn.gelu(self.conv2(x * mask), approximate=False)
        x_len = (x_len + 2 - 2 - 1) // 2 + 1
        mask_pad = make_non_pad_mask(x_len, x.shape[1])[..., None]
        attn_mask = jnp.where(mask_pad[:, None, None, :, 0], 0.0, -1e9)
        if self.positional_embedding is not None:
            x = x + self.positional_embedding[: x.shape[1], :].astype(x.dtype)
            rope = None
        else:
            rope = (self.rope_cos, self.rope_sin)
        for block in self.blocks:
            x = block(x, attn_mask, mask_pad.astype(x.dtype), rope)
        return x, x_len


class EuclideanVQ(Module):
    def __init__(self, dim: int, codebook_size: int):
        self.codebook_size = codebook_size
        self.embed = jnp.zeros((codebook_size, dim))

    def encode(self, x):
        """L2-normalize then nearest codebook entry (model.py:222-225)."""
        x = x / jnp.sqrt(jnp.sum(x ** 2, axis=-1, keepdims=True) + 1e-8)
        flat = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
        emb = self.embed
        dist = (
            jnp.sum(flat ** 2, axis=1, keepdims=True)
            - 2 * flat @ emb.T
            + jnp.sum(emb.astype(jnp.float32) ** 2, axis=1)[None, :]
        )
        return jnp.argmin(dist, axis=-1).reshape(x.shape[:-1]).astype(jnp.int32)

    def decode(self, codes):
        return jnp.take(self.embed, codes, axis=0)


class FSQCodebook(Module):
    """Finite scalar quantization (model_v2.py:68-98): project to 8 dims,
    tanh, round to {0,1,2}, base-3 positional encode."""

    def __init__(self, dim: int, level: int = 3):
        self.project_down = Linear(dim, 8)
        self.level = level

    def encode(self, x):
        shape = x.shape
        flat = x.reshape(-1, shape[-1])
        h = jnp.tanh(self.project_down(flat).astype(jnp.float32))
        h = h * 0.9990000128746033
        h = jnp.round(h) + 1
        powers = jnp.power(float(self.level), jnp.arange(2 ** self.level, dtype=h.dtype))
        mu = jnp.sum(h * powers[None, :], axis=-1)
        return mu.reshape(shape[0], shape[1]).astype(jnp.int32)


class S3Tokenizer(Module):
    """v1: Euclidean VQ over Whisper-encoder features (model.py:233-262)."""

    def __init__(self, name: str = "speech_tokenizer_v1",
                 config: Optional[S3Config] = None):
        self.config = config or S3Config()
        stride = 2 if name == "speech_tokenizer_v1_25hz" else 1
        self.encoder = S3Encoder(self.config, stride, v2=False)
        self.quantizer = EuclideanVQ(self.config.n_audio_state,
                                     self.config.n_codebook_size)

    def __call__(self, mel, mel_len):
        return self.quantize(mel, mel_len)

    def quantize(self, mel, mel_len):
        return _s3_quantize_jit(self, mel, mel_len)

    def _quantize_impl(self, mel, mel_len):
        hidden, code_len = self.encoder(mel, mel_len)
        return self.quantizer.encode(hidden), code_len


class S3TokenizerV2(Module):
    """v2: FSQ + FSMN attention (model_v2.py:322-360)."""

    def __init__(self, name: str = "speech_tokenizer_v2_25hz",
                 config: Optional[S3Config] = None):
        import dataclasses

        config = dataclasses.replace(config) if config else S3Config()
        if "v1" not in name:
            config.n_codebook_size = 3 ** 8
        self.config = config
        self.encoder = S3Encoder(config, stride=2, v2=True)
        self.quantizer = FSQCodebook(config.n_audio_state, level=3)

    def __call__(self, mel, mel_len):
        return self.quantize(mel, mel_len)

    def quantize(self, mel, mel_len):
        return _s3_quantize_jit(self, mel, mel_len)

    def _quantize_impl(self, mel, mel_len):
        hidden, code_len = self.encoder(mel, mel_len)
        return self.quantizer.encode(hidden), code_len


def _s3_sanitize(weights: dict) -> dict:
    """MLX-community S3 safetensors -> our paths: MLX conv weights are
    [O, K, I]-major; ours are [K, I, O]."""
    out = {}
    for k, v in weights.items():
        v = np.asarray(v)
        if k.endswith(".weight") and v.ndim == 3:
            v = v.transpose(1, 2, 0)
        out[k] = v
    return out


def _s3_from_pretrained(cls, name: str, repo_id: str,
                        config: Optional[S3Config] = None):
    from mlx_audio_tpu.codec.loading import fetch_from_hub, load_safetensors
    from mlx_audio_tpu.nn.module import update_arrays

    path = fetch_from_hub(repo_id)
    model = cls(name, config=config)
    f = path / f"{name}.safetensors"
    weights = (load_safetensors(path, f.name) if f.exists()
               else load_safetensors(path))
    return update_arrays(model, _s3_sanitize(weights), strict=False)


def _s3tok_from_pretrained(cls_name):
    def from_pretrained(cls, name: str = cls_name,
                        repo_id: str = "mlx-community/CosyVoice2-0.5B-S3Tokenizer",
                        config: Optional[S3Config] = None):
        """Load named S3 tokenizer weights from a directory or repo
        (reference s3/model_v2.py:355-370)."""
        return _s3_from_pretrained(cls, name, repo_id, config=config)

    return classmethod(from_pretrained)


S3Tokenizer.from_pretrained = _s3tok_from_pretrained("speech_tokenizer_v1")
S3TokenizerV2.from_pretrained = _s3tok_from_pretrained("speech_tokenizer_v2_25hz")


@jax.jit
def _s3_quantize_jit(tokenizer, mel, mel_len):
    """Jitted tokenization (tokenizer as pytree arg; docs/PERF.md)."""
    return tokenizer._quantize_impl(mel, mel_len)
