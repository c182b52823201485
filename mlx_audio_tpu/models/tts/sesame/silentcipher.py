"""SilentCipher deep audio watermark — encoder/decoder architecture.

The reference wraps the external trained `silentcipher` 44.1 kHz model
(/root/reference/mlx_audio/tts/models/sesame/watermarking.py:21-56).  That
package and its weights are not installable offline, so this module
re-creates the *architecture* (SilentCipher, Interspeech 2024: STFT-
magnitude-domain message embedding with an SDR-constrained additive
perturbation, conv2d carrier encoder, per-frame message decoder with
phase-shift decoding).  `sanitize` handles the torch layout transforms
(module.-prefix strip, conv transposes, dropping the unused `dec_c`
carrier-SDR sub-model); checkpoints must be converted to these parameter
paths (see `load_silentcipher`'s error text) since the published
package's exact serialization cannot be validated offline.  Without
weights, `watermarking.py` keeps the self-contained DSSS mark as the
fallback.

API mirrors the silentcipher server model: `encode_wav(audio, sr, message,
message_sdr)` -> watermarked audio and `decode_wav(audio, sr,
phase_shift_decoding)` -> {"status": bool, "messages": [[int]]}.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.nn import Conv2d, Module


@dataclass
class SilentCipherConfig:
    sample_rate: int = 44100
    n_fft: int = 2048
    hop_length: int = 512
    msg_len: int = 5            # bytes in the watermark key
    msg_vocab: int = 256
    hidden: int = 64            # conv channel width
    enc_layers: int = 3
    dec_layers: int = 6
    message_band: int = 512     # low-frequency STFT bins carrying the mark


class GatedConvBlock(Module):
    """conv -> tanh(a) * sigmoid(b) gate, channel-preserving (the gated
    residual unit used throughout the silentcipher conv stacks)."""

    def __init__(self, channels: int, kernel: int = 3):
        self.conv = Conv2d(channels, 2 * channels, kernel, padding=kernel // 2)

    def __call__(self, x: jax.Array) -> jax.Array:
        a, b = jnp.split(self.conv(x), 2, axis=-1)
        return x + jnp.tanh(a) * jax.nn.sigmoid(b)


class MsgEncoder(Module):
    """Message bytes -> per-slot embeddings tiled over time/frequency."""

    def __init__(self, cfg: SilentCipherConfig):
        self.cfg = cfg
        # one embedding table per message slot (position-dependent codes)
        self.embeds = [
            _EmbedTable(cfg.msg_vocab, cfg.message_band)
            for _ in range(cfg.msg_len)
        ]

    def __call__(self, message: jax.Array) -> jax.Array:
        """message int32 [L] -> [1, 1, message_band, L] feature map."""
        cols = [emb(message[i]) for i, emb in enumerate(self.embeds)]
        feat = jnp.stack(cols, axis=-1)             # [band, L]
        return feat[None, None]                     # [1, 1, band, L]


class _EmbedTable(Module):
    def __init__(self, vocab: int, dim: int):
        rng = np.random.default_rng(vocab + dim)
        self.weight = jnp.asarray(
            rng.standard_normal((vocab, dim)) * 0.02, dtype=jnp.float32
        )

    def __call__(self, idx: jax.Array) -> jax.Array:
        return self.weight[idx]


class CarrierEncoder(Module):
    """[carrier magnitude ‖ tiled message] -> additive perturbation in the
    message band (enc_c in the silentcipher checkpoint)."""

    def __init__(self, cfg: SilentCipherConfig):
        self.cfg = cfg
        self.conv_in = Conv2d(1 + cfg.msg_len, cfg.hidden, 3, padding=1)
        self.blocks = [GatedConvBlock(cfg.hidden) for _ in range(cfg.enc_layers)]
        self.conv_out = Conv2d(cfg.hidden, 1, 3, padding=1)

    def __call__(self, mag_band: jax.Array, msg_feat: jax.Array) -> jax.Array:
        """mag_band [1, T, band, 1]; msg_feat [1, 1, band, L] ->
        perturbation [1, T, band, 1]."""
        t = mag_band.shape[1]
        # tile the L message-slot columns over time as L input channels
        msg = jnp.broadcast_to(
            msg_feat, (1, t, self.cfg.message_band, self.cfg.msg_len)
        )
        h = jax.nn.relu(self.conv_in(jnp.concatenate([mag_band, msg], axis=-1)))
        for blk in self.blocks:
            h = blk(h)
        return self.conv_out(h)


class MsgDecoder(Module):
    """Magnitude STFT -> per-frame logits over the message vocabulary for
    each slot (dec_m in the silentcipher checkpoint)."""

    def __init__(self, cfg: SilentCipherConfig):
        self.cfg = cfg
        self.conv_in = Conv2d(1, cfg.hidden, 3, padding=1)
        self.blocks = [GatedConvBlock(cfg.hidden) for _ in range(cfg.dec_layers)]
        # project the frequency axis down to per-slot vocab logits
        self.conv_out = Conv2d(cfg.hidden, cfg.msg_len * cfg.msg_vocab,
                               (1, cfg.message_band), padding=0)

    def __call__(self, mag_band: jax.Array) -> jax.Array:
        """mag_band [1, T, band, 1] -> logits [T, msg_len, vocab]."""
        h = jax.nn.relu(self.conv_in(mag_band))
        for blk in self.blocks:
            h = blk(h)
        out = self.conv_out(h)                       # [1, T, 1, L*V]
        t = out.shape[1]
        return out.reshape(t, self.cfg.msg_len, self.cfg.msg_vocab)


def _stft(x: np.ndarray, cfg: SilentCipherConfig):
    """-> complex [T, F] (frames first, dsp.stft layout); periodic hann
    (torch-trained checkpoint convention, docs/PARITY.md)."""
    from mlx_audio_tpu.dsp import stft

    return stft(jnp.asarray(x, dtype=jnp.float32), n_fft=cfg.n_fft,
                hop_length=cfg.hop_length, window="hann_periodic",
                center=True)


def _istft(spec_tf, length: int, cfg: SilentCipherConfig):
    """Exact inverse of `_stft` (torch.istft semantics: windowed OLA
    normalized by OLA(w^2)); spec [T, F] -> audio [length].  dsp.istft
    keeps the reference's window-*sum* normalization for parity, which is
    not a true inverse — watermarking needs perfect reconstruction so the
    only signal change is the embedded perturbation."""
    from mlx_audio_tpu.dsp import _irdft_basis, _window_np, overlap_add

    n_fft, hop = cfg.n_fft, cfg.hop_length
    a, b = _irdft_basis(n_fft)
    frames = (jnp.real(spec_tf) @ jnp.asarray(a, dtype=jnp.float32)
              + jnp.imag(spec_tf) @ jnp.asarray(b, dtype=jnp.float32))
    w = jnp.asarray(_window_np("hann_periodic", n_fft), dtype=jnp.float32)
    recon = overlap_add(frames * w, hop)
    wsq = overlap_add(
        jnp.broadcast_to(w * w, (spec_tf.shape[0], n_fft)), hop
    )
    recon = recon / jnp.where(wsq > 1e-8, wsq, 1.0)
    return recon[n_fft // 2: n_fft // 2 + length]


@jax.jit
def _encode_graph(model, mag_band, msg_feat):
    return model.enc_c(mag_band, msg_feat)


@jax.jit
def _decode_graph(model, mag_band):
    return model.dec_m(mag_band)


class SilentCipherModel(Module):
    """The 44.1 kHz silentcipher server model: enc_c + dec_m (+ message
    embeddings), with SDR-constrained embedding."""

    def __init__(self, config: Optional[SilentCipherConfig] = None):
        self.cfg = config or SilentCipherConfig()
        self.msg_encoder = MsgEncoder(self.cfg)
        self.enc_c = CarrierEncoder(self.cfg)
        self.dec_m = MsgDecoder(self.cfg)

    # -- silentcipher server API ------------------------------------------

    def encode_wav(self, audio: np.ndarray, sample_rate: int,
                   message: List[int], calc_sdr: bool = False,
                   message_sdr: float = 36.0):
        cfg = self.cfg
        assert sample_rate == cfg.sample_rate, (sample_rate, cfg.sample_rate)
        audio = np.asarray(audio, dtype=np.float32).reshape(-1)
        spec = _stft(audio, cfg)                       # [T, F] complex
        mag = jnp.abs(spec)
        band = mag[:, : cfg.message_band][None, :, :, None]  # [1,T,band,1]
        msg = jnp.asarray(list(message), dtype=jnp.int32)
        pert = _encode_graph(self, band, self.msg_encoder(msg))[0, :, :, 0]

        # SDR constraint (the silentcipher trick): scale the perturbation so
        # 20*log10(|carrier|/|delta|) >= message_sdr
        target = 10.0 ** (-message_sdr / 20.0)
        c_rms = jnp.sqrt(jnp.mean(mag ** 2) + 1e-9)
        p_rms = jnp.sqrt(jnp.mean(pert ** 2) + 1e-9)
        pert = pert * (target * c_rms / p_rms)

        new_mag = jnp.maximum(
            mag.at[:, : cfg.message_band].add(pert), 0.0
        )
        phase = jnp.angle(spec)
        out = _istft(new_mag * jnp.exp(1j * phase), len(audio), cfg)
        return np.asarray(out), None, None

    def decode_wav(self, audio: np.ndarray, sample_rate: int,
                   phase_shift_decoding: bool = True) -> dict:
        cfg = self.cfg
        assert sample_rate == cfg.sample_rate
        audio = np.asarray(audio, dtype=np.float32).reshape(-1)
        shifts = (
            range(0, cfg.hop_length, cfg.hop_length // 4)
            if phase_shift_decoding else (0,)
        )
        best = None
        for shift in shifts:
            spec = _stft(audio[shift:], cfg)
            band = jnp.abs(spec)[:, : cfg.message_band][None, :, :, None]
            logits = _decode_graph(self, band)          # [T, L, V]
            probs = jax.nn.softmax(logits, axis=-1).mean(axis=0)  # [L, V]
            conf = float(jnp.max(probs, axis=-1).mean())
            msg = [int(i) for i in np.asarray(jnp.argmax(probs, axis=-1))]
            if best is None or conf > best[0]:
                best = (conf, msg)
        conf, msg = best
        # a decode is a detection when the per-slot winners dominate the
        # 1/vocab chance level by a wide margin
        status = conf > (8.0 / self.cfg.msg_vocab)
        return {"status": status, "messages": [msg], "confidence": conf}

    # -- checkpoint loading ------------------------------------------------

    def sanitize(self, weights: dict) -> dict:
        """Layout transforms for torch checkpoints whose parameter paths
        match these modules: strip `module.` wrappers, transpose conv2d
        [O, I, kh, kw] -> [kh, kw, I, O], and DROP sub-models this port
        does not implement (`dec_c.*`, the carrier-SDR estimator — unused
        by the encode/decode server paths exposed here).  Paths that still
        do not line up are reported by `load_silentcipher` with a clear
        error rather than loaded approximately."""
        out = {}
        for key, w in weights.items():
            k = key.replace("module.", "")
            if k.startswith("dec_c."):
                continue
            w = np.asarray(w)
            if w.ndim == 4:  # torch conv2d layout
                w = w.transpose(2, 3, 1, 0)
            out[k] = w
        return out


def load_silentcipher(checkpoint_dir: str) -> SilentCipherModel:
    """Build the model and load a silentcipher checkpoint directory
    (config.json optional + *.safetensors / *.pt)."""
    import json
    import os

    cfg = SilentCipherConfig()
    native = False
    cfg_path = os.path.join(checkpoint_dir, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            raw = json.load(f)
        native = bool(raw.get("native_format"))
        cfg = SilentCipherConfig(**{
            k: v for k, v in raw.items()
            if k in SilentCipherConfig.__dataclass_fields__
        })
    model = SilentCipherModel(cfg)

    from pathlib import Path

    from mlx_audio_tpu.nn.module import update_arrays
    from mlx_audio_tpu.utils.loader import load_weights_files

    weights = load_weights_files(Path(checkpoint_dir))
    if not native:  # torch checkpoints need the conv-layout transposes
        weights = model.sanitize(weights)
    try:
        return update_arrays(model, weights)
    except (KeyError, ValueError) as e:
        raise ValueError(
            f"silentcipher checkpoint at {checkpoint_dir} does not match "
            "this architecture (hidden/layer/band sizes come from "
            "config.json; parameter paths must line up with "
            "SilentCipherModel — msg_encoder.embeds.N.weight, "
            "enc_c.conv_in/blocks.N.conv/conv_out, dec_m.*).  Convert the "
            "published checkpoint to this layout (native_format: true in "
            f"config.json skips the torch transposes).  Detail: {e}"
        ) from e
