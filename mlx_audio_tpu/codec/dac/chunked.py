"""Chunked DAC compression: windowed encode/decode + the `.dac` artifact.

Capability parity with /root/reference/mlx_audio/codec/models/descript/
base.py:16-228 (CodecMixin.compress/decompress + DACFile), re-designed
for TPU execution:

* The reference mutates every conv layer's padding in place and loops
  windows serially (base.py:64-82, 167-175).  Here the unpadded ("valid
  conv") model is a weight-sharing pytree twin — same arrays, zero-pad
  static metadata — and ALL windows encode/decode as ONE batched jitted
  call: every window has the same static shape, so one compiled program
  covers the whole file and the MXU sees batch W instead of 1.
* Delay/output-length arithmetic walks the conv chain with the same
  formulas as the reference (base.py:84-123).

The `.dac` artifact uses the same np.save dict layout as the reference
(uint16 codes + metadata), so files interchange.  `original_length` is
stored in samples and the decompressed waveform is trimmed to it (the
reference stores seconds and never trims — a quirk, not a contract;
loading such files still works, seconds are detected by dtype).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from pathlib import Path
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import tree_util

from mlx_audio_tpu.nn import WNConv1d, WNConvTranspose1d

SUPPORTED_VERSIONS = ["1.0.0"]


@dataclass
class DACFile:
    codes: np.ndarray  # [1, n_codebooks, T]
    chunk_length: int
    original_length: int  # samples (reference stores seconds; see module doc)
    input_db: float
    channels: int
    sample_rate: int
    padding: bool
    dac_version: str = SUPPORTED_VERSIONS[-1]

    def save(self, path) -> Path:
        artifacts = {
            "codes": np.asarray(self.codes).astype(np.uint16),
            "metadata": {
                "input_db": float(self.input_db),
                "original_length": self.original_length,
                "sample_rate": self.sample_rate,
                "chunk_length": self.chunk_length,
                "channels": self.channels,
                "padding": self.padding,
                "dac_version": SUPPORTED_VERSIONS[-1],
            },
        }
        path = Path(path).with_suffix(".dac")
        with open(path, "wb") as f:
            np.save(f, artifacts)
        return path

    @classmethod
    def load(cls, path) -> "DACFile":
        artifacts = np.load(path, allow_pickle=True)[()]
        meta = dict(artifacts["metadata"])
        if meta.get("dac_version") not in SUPPORTED_VERSIONS:
            raise RuntimeError(
                f"{path} can't be loaded with this version of the codec"
            )
        codes = np.asarray(artifacts["codes"], dtype=np.int32)
        return cls(codes=codes, **meta)


# ---------------------------------------------------------------------------
# conv-chain arithmetic (reference base.py:84-123)
# ---------------------------------------------------------------------------


def _conv_chain(dac) -> list:
    """Every WNConv(Transpose)1d in forward order (encoder, then decoder;
    the quantizer's kernel-1 stride-1 projections are length no-ops and
    are omitted — the reference includes them, with identical result)."""
    found = []

    def walk(obj):
        if isinstance(obj, (WNConv1d, WNConvTranspose1d)):
            found.append(obj)
            return
        for attr in ("block", "model"):
            seq = getattr(obj, attr, None)
            if isinstance(seq, list):
                for item in seq:
                    walk(item)

    walk(dac.encoder)
    walk(dac.decoder)
    return found


def _layer_kds(layer) -> tuple[int, int, int, bool]:
    """(kernel, stride, dilation, is_transpose) for a conv layer."""
    k = layer.weight_v.shape[0]
    s = layer.stride
    d = getattr(layer, "dilation", 1)
    return k, s, d, isinstance(layer, WNConvTranspose1d)


def get_output_length(dac, input_length: int) -> int:
    """Valid-conv output length of the full encode+decode chain
    (reference base.py:109-123)."""
    L = input_length
    for layer in _conv_chain(dac):
        k, s, d, is_t = _layer_kds(layer)
        if is_t:
            L = (L - 1) * s + d * (k - 1) + 1
        else:
            L = ((L - d * (k - 1) - 1) / s) + 1
        L = math.floor(L)
    return L


def get_delay(dac) -> int:
    """Samples of left/right context consumed by valid convs
    (reference base.py:84-107)."""
    l_out = get_output_length(dac, 0)
    L = l_out
    for layer in reversed(_conv_chain(dac)):
        k, s, d, is_t = _layer_kds(layer)
        if is_t:
            L = ((L - d * (k - 1) - 1) / s) + 1
        else:
            L = (L - 1) * s + d * (k - 1) + 1
        L = math.ceil(L)
    return (L - l_out) // 2


def unpadded_twin(dac):
    """A weight-sharing copy of `dac` whose convs run in valid mode.

    The copy is a fresh pytree (tree_map identity) holding the SAME
    device arrays; only the static padding metadata differs, mirroring
    the reference's in-place `self.padding = False` (base.py:64-82)
    without mutating the caller's model."""
    twin = tree_util.tree_map(lambda x: x, dac)

    def strip(obj):
        if isinstance(obj, (WNConv1d, WNConvTranspose1d)):
            obj.padding = 0
            return
        for attr in ("block", "model"):
            seq = getattr(obj, attr, None)
            if isinstance(seq, list):
                for item in seq:
                    strip(item)

    strip(twin.encoder)
    strip(twin.decoder)
    return twin


# ---------------------------------------------------------------------------
# compress / decompress
# ---------------------------------------------------------------------------


def compress(dac, audio, win_duration: float = 1.0,
             normalize_db: Optional[float] = -16,
             n_quantizers: Optional[int] = None) -> DACFile:
    """audio (1-D array or file path) -> DACFile.

    Short clips (<= win_duration) use one padded encode; longer audio is
    delay-padded, windowed, and ALL windows encode as one batched jitted
    call (reference base.py:125-194 loops them serially)."""
    if isinstance(audio, (str, Path)):
        from mlx_audio_tpu.utils.audio_io import load_audio

        audio = load_audio(str(audio), dac.sample_rate)
    audio = np.asarray(audio, dtype=np.float32).reshape(-1)
    nt = audio.shape[-1]
    signal_duration = nt / dac.sample_rate

    rms = float(np.sqrt(np.mean(audio ** 2) + 1e-12))
    input_db = 20 * math.log10(rms + 1e-12)
    if normalize_db is not None:
        audio = audio * (10 ** ((normalize_db - input_db) / 20))

    if signal_duration <= win_duration:
        codes = np.asarray(
            dac.encode(jnp.asarray(audio)[None, None, :], n_quantizers)[1]
        )
        return DACFile(
            codes=codes, chunk_length=codes.shape[-1], original_length=nt,
            input_db=input_db, channels=1, sample_rate=dac.sample_rate,
            padding=True, dac_version=SUPPORTED_VERSIONS[-1],
        )

    twin = unpadded_twin(dac)
    delay = get_delay(dac)
    n_samples = int(win_duration * dac.sample_rate)
    n_samples = int(math.ceil(n_samples / dac.hop_length) * dac.hop_length)
    hop = get_output_length(dac, n_samples)

    padded = np.pad(audio, (delay, delay))
    starts = list(range(0, nt, hop))
    windows = np.zeros((len(starts), 1, n_samples), dtype=np.float32)
    for w, start in enumerate(starts):
        piece = padded[start: start + n_samples]
        windows[w, 0, : piece.shape[-1]] = piece

    codes_w = np.asarray(
        twin.encode(jnp.asarray(windows), n_quantizers)[1]
    )  # [W, nq, Tc]
    chunk_length = codes_w.shape[-1]
    codes = codes_w.transpose(1, 0, 2).reshape(
        1, codes_w.shape[1], -1)  # [1, nq, W*Tc]

    return DACFile(
        codes=codes, chunk_length=chunk_length, original_length=nt,
        input_db=input_db, channels=1, sample_rate=dac.sample_rate,
        padding=False, dac_version=SUPPORTED_VERSIONS[-1],
    )


def decompress(dac, obj: Union[str, Path, DACFile],
               normalize_db: Optional[float] = -16) -> np.ndarray:
    """DACFile (or .dac path) -> waveform [1, T].

    Chunks decode as one batched jitted call; a ragged tail chunk (only
    possible for externally-produced files) decodes separately."""
    if isinstance(obj, (str, Path)):
        obj = DACFile.load(obj)
    if dac.sample_rate != obj.sample_rate:
        raise ValueError(
            f"sample rate mismatch: file {obj.sample_rate} vs model "
            f"{dac.sample_rate}"
        )

    model = dac if obj.padding else unpadded_twin(dac)
    codes = jnp.asarray(np.asarray(obj.codes, dtype=np.int32))
    nq = codes.shape[1]
    t = codes.shape[-1]
    n_full = t // obj.chunk_length
    pieces = []
    if n_full:
        stacked = (
            codes[..., : n_full * obj.chunk_length]
            .reshape(nq, n_full, obj.chunk_length)
            .swapaxes(0, 1)
        )  # [W, nq, Tc]
        z = model.quantizer.from_codes(stacked)
        recons = np.asarray(model.decode(z))  # [W, 1, T]
        pieces.append(recons.reshape(-1))
    if t % obj.chunk_length:
        tail = codes[..., n_full * obj.chunk_length:]
        z = model.quantizer.from_codes(tail)
        pieces.append(np.asarray(model.decode(z)).reshape(-1))
    audio = np.concatenate(pieces) if len(pieces) > 1 else pieces[0]

    if normalize_db is not None:
        audio = audio * (10 ** ((obj.input_db - normalize_db) / 20))

    length = obj.original_length
    if isinstance(length, float):  # reference-written file: seconds
        length = int(round(length * obj.sample_rate))
    if length:
        audio = audio[:length]
        if audio.shape[-1] < length:
            # 'same'-padded conv chains can come up a few samples short of
            # the hop-rounded input (odd strides pad asymmetrically);
            # keep the contract output_length == original_length
            audio = np.pad(audio, (0, length - audio.shape[-1]))
    return audio[None, :].astype(np.float32)
