"""DSP core: windows, STFT/ISTFT, mel filterbanks — TPU-first.

Re-creates the capability surface of the reference DSP core
(/root/reference/mlx_audio/utils.py:10-237) with a design tuned for XLA/TPU:

* **STFT as matmul-DFT.**  Speech FFT sizes are small (20..2048), so instead
  of routing through an FFT op we fold the window into a real DFT basis and
  hit the MXU with one ``[frames, n_fft] @ [n_fft, 2*n_bins]`` matmul.  This
  fuses window application, keeps everything real-valued, static-shaped and
  batchable, and avoids complex dtypes in hot paths.
* **ISTFT without scatter.**  The reference overlap-adds with
  ``array.at[idx].add`` (utils.py:146-147), which is a TPU-hostile scatter.
  We instead pad each inverse-DFT frame to a multiple of ``hop`` and fold by
  ``K = ceil(win/hop)`` static shifted adds of contiguous slices — pure
  pad+add, fully fused by XLA.
* Windows and mel matrices are computed host-side in float64 numpy (cached)
  and enter the graph as constants.

All public entry points accept arbitrary leading batch dimensions; the
unbatched forms match the reference's shapes exactly (see tests/test_dsp.py).
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "hanning",
    "hamming",
    "blackman",
    "bartlett",
    "get_window",
    "stft",
    "istft",
    "mel_filters",
    "log_mel_spectrogram",
]


# ---------------------------------------------------------------------------
# Windows (host-side, cached; reference semantics are "symmetric" windows:
# utils.py:10-47 — note denominators of (size - 1))
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _window_np(name: str, size: int) -> np.ndarray:
    if size == 1:
        return np.ones(1)
    # "<name>_periodic" = DFT-even windows (torch.hann_window and
    # torchaudio defaults: denominator N instead of N-1).  Real checkpoints
    # (openai-whisper, NeMo, torchaudio-mel GANs) are trained with these;
    # the plain names keep the reference's symmetric semantics
    # (utils.py:10-47) for the generic DSP API.
    if name.endswith("_periodic"):
        return _window_np(name[: -len("_periodic")], size + 1)[:-1]
    n = np.arange(size, dtype=np.float64)
    if name in ("hann", "hanning"):
        w = 0.5 * (1 - np.cos(2 * np.pi * n / (size - 1)))
    elif name == "hamming":
        w = 0.54 - 0.46 * np.cos(2 * np.pi * n / (size - 1))
    elif name == "blackman":
        w = (
            0.42
            - 0.5 * np.cos(2 * np.pi * n / (size - 1))
            + 0.08 * np.cos(4 * np.pi * n / (size - 1))
        )
    elif name == "bartlett":
        w = 1 - 2 * np.abs(n - (size - 1) / 2) / (size - 1)
    else:
        raise ValueError(f"Unknown window function: {name}")
    return w


def hanning(size: int) -> jax.Array:
    return jnp.asarray(_window_np("hann", size), dtype=jnp.float32)


def hamming(size: int) -> jax.Array:
    return jnp.asarray(_window_np("hamming", size), dtype=jnp.float32)


def blackman(size: int) -> jax.Array:
    return jnp.asarray(_window_np("blackman", size), dtype=jnp.float32)


def bartlett(size: int) -> jax.Array:
    return jnp.asarray(_window_np("bartlett", size), dtype=jnp.float32)


def get_window(window: Union[str, jax.Array, np.ndarray], size: int) -> np.ndarray:
    """Resolve a window spec to a float64 numpy array of length ``size``.

    Shorter windows are zero-padded on the right (reference utils.py:74-76).
    """
    if isinstance(window, str):
        w = _window_np(window.lower(), size)
    else:
        w = np.asarray(window, dtype=np.float64)
    if w.shape[0] < size:
        w = np.concatenate([w, np.zeros(size - w.shape[0])])
    elif w.shape[0] > size:
        raise ValueError(f"window length {w.shape[0]} > target size {size}")
    return w


# ---------------------------------------------------------------------------
# DFT bases (host-side constants)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _rdft_basis(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Forward real-DFT basis: ``X_k = sum_n x_n e^{-2πi nk/N}``.

    Returns (cos, -sin) matrices of shape [n_fft, n_bins] so that
    ``real = frames @ cos`` and ``imag = frames @ msin``.
    """
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = 2 * np.pi * n * k / n_fft
    return np.cos(ang), -np.sin(ang)


@lru_cache(maxsize=None)
def _irdft_basis(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse real-DFT basis: ``x = Re(X) @ A + Im(X) @ B`` with the
    conjugate-symmetric double-counting factors folded in."""
    n_bins = n_fft // 2 + 1
    k = np.arange(n_bins)[:, None]
    n = np.arange(n_fft)[None, :]
    ang = 2 * np.pi * k * n / n_fft
    c = np.full((n_bins, 1), 2.0)
    c[0] = 1.0
    if n_fft % 2 == 0:
        c[-1] = 1.0
    a = c * np.cos(ang) / n_fft
    b = -c * np.sin(ang) / n_fft
    return a, b


# ---------------------------------------------------------------------------
# Framing / padding
# ---------------------------------------------------------------------------


def _center_pad(x: jax.Array, padding: int, pad_mode: str) -> jax.Array:
    """Pad the last axis; 'reflect' excludes the edge sample (utils.py:78-86)."""
    if padding == 0:
        return x
    if pad_mode == "constant":
        cfg = [(0, 0)] * (x.ndim - 1) + [(padding, padding)]
        return jnp.pad(x, cfg)
    if pad_mode == "reflect":
        prefix = x[..., 1 : padding + 1][..., ::-1]
        suffix = x[..., -(padding + 1) : -1][..., ::-1]
        return jnp.concatenate([prefix, x, suffix], axis=-1)
    raise ValueError(f"Invalid pad_mode {pad_mode}")


def frame_signal(x: jax.Array, frame_length: int, hop: int) -> jax.Array:
    """[..., T] -> [..., num_frames, frame_length]."""
    t = x.shape[-1]
    num_frames = 1 + (t - frame_length) // hop
    if num_frames <= 0:
        raise ValueError(
            f"Input is too short (length={t}) for frame_length={frame_length} "
            f"with hop_length={hop}."
        )
    if frame_length % hop == 0:
        # gather-free framing: hop-strided reshape + frame_length/hop
        # contiguous row slices (overlapping-window gathers measured ~3% of
        # Kokoro synthesis, docs/PERF.md)
        k = frame_length // hop
        xr = x[..., : (num_frames - 1 + k) * hop].reshape(
            *x.shape[:-1], num_frames - 1 + k, hop
        )
        return jnp.concatenate(
            [xr[..., j:j + num_frames, :] for j in range(k)], axis=-1
        )
    idx = np.arange(num_frames)[:, None] * hop + np.arange(frame_length)[None, :]
    return jnp.take(x, jnp.asarray(idx), axis=-1)


# ---------------------------------------------------------------------------
# STFT / ISTFT
# ---------------------------------------------------------------------------


def stft(
    x: jax.Array,
    n_fft: int = 800,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    window: Union[str, jax.Array] = "hann",
    center: bool = True,
    pad_mode: str = "reflect",
) -> jax.Array:
    """Short-time Fourier transform.

    [..., T] -> complex64 [..., num_frames, n_fft//2 + 1].  Matches the
    reference contract (utils.py:52-101): ``num_frames = 1 + (T_padded -
    n_fft)//hop``, window zero-padded to ``n_fft``.
    """
    real, imag = stft_realimag(x, n_fft, hop_length, win_length, window, center, pad_mode)
    return jax.lax.complex(real, imag)


def stft_realimag(
    x: jax.Array,
    n_fft: int = 800,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    window: Union[str, jax.Array] = "hann",
    center: bool = True,
    pad_mode: str = "reflect",
) -> tuple[jax.Array, jax.Array]:
    """STFT returning (real, imag) — the TPU-native hot path (no complex)."""
    hop_length = hop_length or n_fft // 4
    win_length = win_length or n_fft

    w = get_window(window, win_length)
    if w.shape[0] < n_fft:
        w = np.concatenate([w, np.zeros(n_fft - w.shape[0])])

    cos_b, msin_b = _rdft_basis(n_fft)
    # Fold the window into the DFT basis: one matmul does window + DFT.
    wc = jnp.asarray(w[:, None] * cos_b, dtype=jnp.float32)
    ws = jnp.asarray(w[:, None] * msin_b, dtype=jnp.float32)

    if center:
        x = _center_pad(x, n_fft // 2, pad_mode)
    frames = frame_signal(x, n_fft, hop_length).astype(jnp.float32)
    real = frames @ wc
    imag = frames @ ws
    return real, imag


def istft(
    x: jax.Array,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    window: Union[str, jax.Array] = "hann",
    center: bool = True,
    length: Optional[int] = None,
) -> jax.Array:
    """Inverse STFT with window-sum normalization.

    Input layout follows the reference (utils.py:104-158): ``[..., n_freqs,
    num_frames]`` (frequency first).  The reference builds its window as
    ``window_fn(win_length + 1)[:-1]`` — i.e. a *periodic* window — which we
    reproduce for parity.  Overlap-add is a static fold, not a scatter.
    """
    n_freqs = x.shape[-2]
    n_fft = (n_freqs - 1) * 2
    if win_length is None:
        win_length = n_fft
    if hop_length is None:
        hop_length = win_length // 4

    if isinstance(window, str):
        w = _window_np(window.lower(), win_length + 1)[:-1]
    else:
        w = np.asarray(window, dtype=np.float64)
    if w.shape[0] < win_length:
        w = np.concatenate([w, np.zeros(win_length - w.shape[0])])

    num_frames = x.shape[-1]

    if jnp.iscomplexobj(x):
        re, im = jnp.real(x), jnp.imag(x)
    else:
        re, im = x, jnp.zeros_like(x)

    a, b = _irdft_basis(n_fft)
    a = jnp.asarray(a, dtype=jnp.float32)
    b = jnp.asarray(b, dtype=jnp.float32)
    # [..., frames, n_freqs] @ [n_freqs, n_fft] -> [..., frames, n_fft]
    re_t = jnp.swapaxes(re, -1, -2).astype(jnp.float32)
    im_t = jnp.swapaxes(im, -1, -2).astype(jnp.float32)
    frames_time = re_t @ a + im_t @ b
    frames_time = frames_time[..., :win_length] * jnp.asarray(w, dtype=jnp.float32)

    recon = overlap_add(frames_time, hop_length)

    # Window-sum normalization (reference divides by sum of raw window
    # values where nonzero, utils.py:143-150).
    wsum_frames = jnp.broadcast_to(
        jnp.asarray(w, dtype=jnp.float32), (num_frames, win_length)
    )
    window_sum = overlap_add(wsum_frames, hop_length)
    recon = jnp.where(window_sum != 0, recon / jnp.where(window_sum != 0, window_sum, 1.0), recon)

    if center and length is None:
        # trailing trim is floor(-win/2), matching the reference's
        # `[-win//2]` (odd windows trim one extra sample at the end)
        recon = recon[..., win_length // 2 : -win_length // 2]
    if length is not None:
        recon = recon[..., :length]
    return recon


def overlap_add(frames: jax.Array, hop: int) -> jax.Array:
    """Fold [..., num_frames, frame_len] -> [..., (num_frames-1)*hop + frame_len].

    TPU-friendly: pad ``frame_len`` up to ``K*hop``, reshape to K hop-sized
    segments, and add K statically-shifted contiguous copies.  No scatter.
    """
    *lead, num_frames, frame_len = frames.shape
    out_len = (num_frames - 1) * hop + frame_len
    k = -(-frame_len // hop)  # ceil
    pad = k * hop - frame_len
    if pad:
        frames = jnp.pad(frames, [(0, 0)] * (frames.ndim - 1) + [(0, pad)])
    segs = frames.reshape(*lead, num_frames, k, hop)
    total = (num_frames + k - 1) * hop
    out = jnp.zeros((*lead, total), dtype=frames.dtype)
    for j in range(k):
        contrib = segs[..., :, j, :].reshape(*lead, num_frames * hop)
        contrib = jnp.pad(
            contrib,
            [(0, 0)] * (len(lead)) + [(j * hop, (k - 1 - j) * hop)],
        )
        out = out + contrib
    return out[..., :out_len]


# ---------------------------------------------------------------------------
# Mel filterbank (host-side, cached; reference utils.py:164-237)
# ---------------------------------------------------------------------------


def _hz_to_mel(freq: float, mel_scale: str) -> float:
    if mel_scale == "htk":
        return 2595.0 * math.log10(1.0 + freq / 700.0)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    if freq >= min_log_hz:
        mels = min_log_mel + math.log(freq / min_log_hz) / logstep
    return mels


def _mel_to_hz(mels: np.ndarray, mel_scale: str) -> np.ndarray:
    if mel_scale == "htk":
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(
        mels >= min_log_mel,
        min_log_hz * np.exp(logstep * (mels - min_log_mel)),
        freqs,
    )


@lru_cache(maxsize=None)
def _mel_filters_np(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    f_min: float,
    f_max: Optional[float],
    norm: Optional[str],
    mel_scale: str,
) -> np.ndarray:
    f_max = f_max or sample_rate / 2
    n_freqs = n_fft // 2 + 1
    # NB: reference uses linspace(0, sample_rate // 2, ...) — integer floor
    # of Nyquist (utils.py:210); keep that for exact parity.
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)

    m_min = _hz_to_mel(f_min, mel_scale)
    m_max = _hz_to_mel(f_max, mel_scale)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz(m_pts, mel_scale)

    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]
    down_slopes = (-slopes[:, :-2]) / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))

    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb = fb * enorm[None, :]

    return fb.T  # [n_mels, n_freqs]


def mel_filters(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    f_min: float = 0,
    f_max: Optional[float] = None,
    norm: Optional[str] = None,
    mel_scale: str = "htk",
    dtype=jnp.float32,
) -> jax.Array:
    """[n_mels, n_fft//2+1] triangular filterbank (HTK or Slaney scale)."""
    fb = _mel_filters_np(sample_rate, n_fft, n_mels, float(f_min), f_max, norm, mel_scale)
    return jnp.asarray(fb, dtype=dtype)


