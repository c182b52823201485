"""AI-audio watermarking for CSM outputs.

Capability parity with /root/reference/mlx_audio/tts/models/sesame/
watermarking.py:1-120, which wraps the external `silentcipher` 44.1 kHz
model.  silentcipher (and its pretrained weights) are not installable in
this environment, so this module provides a self-contained direct-sequence
spread-spectrum (DSSS) watermark with the same API surface:
``load_watermarker`` / ``watermark`` / ``verify`` / ``check_audio_from_file``
and the public ``CSM_1B_GH_WATERMARK`` key.  Like the reference, embedding
runs at 44.1 kHz with target watermark SDR ~36 dB (reference :50).

Scheme: the key's bytes become a bit message; each bit modulates the sign
of a seeded pseudo-noise chip sequence over a fixed-length frame, scaled to
the frame's RMS so the mark stays imperceptible; decoding is a matched
filter + majority vote over message repetitions.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

# This watermark key is public, it is not secure (reference :9-11).
CSM_1B_GH_WATERMARK = [212, 211, 146, 56, 201]

_WM_SR = 44_100
_FRAME = 1024            # samples per embedded bit
_PN_SEED = 0x5EED
# Watermark SDR 30 dB.  The reference's learned silentcipher model reaches
# 36 dB (message_sdr=36, reference :50); a plain matched-filter DSSS needs
# ~2x the chip amplitude for reliable decode on broadband audio.
_ALPHA = 10 ** (-30 / 20)


class Watermarker:
    """Stateless DSSS codec; one PN sequence shared by embed/verify.

    The chip sequence is band-limited to ~8 kHz so the mark survives
    44.1 kHz <-> 24 kHz resampling (the reference's model is similarly
    robust); decoding searches a few sample shifts for alignment.
    """

    def __init__(self, frame: int = _FRAME, seed: int = _PN_SEED):
        self.frame = frame
        rng = np.random.default_rng(seed)
        chips = rng.choice([-1.0, 1.0], size=frame)
        # windowed-sinc lowpass, cutoff 0.18 * 44.1 kHz ~ 8 kHz
        taps = 63
        t = np.arange(taps) - (taps - 1) / 2
        h = np.sinc(2 * 0.18 * t) * np.hamming(taps)
        h /= h.sum()
        pn = np.convolve(chips, h, mode="same")
        self.pn = (pn / np.sqrt(np.mean(pn ** 2))).astype(np.float32)

    @staticmethod
    def _key_bits(key: List[int]) -> np.ndarray:
        bits = np.unpackbits(np.asarray(key, dtype=np.uint8))
        return bits.astype(np.float32) * 2 - 1  # {0,1} -> {-1,+1}

    def embed(self, audio: np.ndarray, key: List[int]) -> np.ndarray:
        audio = np.asarray(audio, dtype=np.float32).reshape(-1)
        bits = self._key_bits(key)
        n_frames = len(audio) // self.frame
        out = audio.copy()
        for i in range(n_frames):
            seg = slice(i * self.frame, (i + 1) * self.frame)
            rms = float(np.sqrt(np.mean(audio[seg] ** 2)) + 1e-8)
            chip = bits[i % len(bits)] * self.pn * (rms * _ALPHA)
            out[seg] = out[seg] + chip
        return out

    def _decode_at(self, audio: np.ndarray, n_bits: int, shift: int):
        usable = audio[shift:] if shift >= 0 else audio[:shift]
        n_frames = len(usable) // self.frame
        if n_frames < n_bits:
            return None, 0.0
        frames = usable[:n_frames * self.frame].reshape(n_frames, self.frame)
        corr = frames @ self.pn
        votes = np.zeros(n_bits)
        for i in range(n_frames):
            votes[i % n_bits] += corr[i]
        return (votes > 0).astype(np.uint8), float(np.mean(np.abs(votes)))

    def decode(self, audio: np.ndarray, n_bits: int) -> Optional[np.ndarray]:
        """Majority-vote decode, searching small alignment shifts (the
        44.1k<->24k roundtrip can offset frames by a couple of samples)."""
        audio = np.asarray(audio, dtype=np.float32).reshape(-1)
        best, best_conf = None, -1.0
        for shift in range(-3, 4):
            bits, conf = self._decode_at(audio, n_bits, shift)
            if bits is not None and conf > best_conf:
                best, best_conf = bits, conf
        return best


def load_watermarker(checkpoint_dir: Optional[str] = None):
    """silentcipher-architecture model when trained weights are available
    (``checkpoint_dir`` arg or $MLX_AUDIO_TPU_SILENTCIPHER), else the
    self-contained DSSS fallback (reference load_watermarker wraps the
    trained silentcipher 44.1k model, watermarking.py:21-25)."""
    import os

    ckpt = checkpoint_dir or os.environ.get("MLX_AUDIO_TPU_SILENTCIPHER")
    if ckpt and os.path.isdir(ckpt):
        from mlx_audio_tpu.models.tts.sesame.silentcipher import (
            load_silentcipher,
        )

        return load_silentcipher(ckpt)
    return Watermarker()


def _resample(audio: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    from mlx_audio_tpu.utils.audio_io import resample_audio

    return resample_audio(audio, orig_sr, target_sr)


def watermark(watermarker, audio_array, sample_rate: int,
              watermark_key: List[int]) -> np.ndarray:
    """Embed at 44.1 kHz and resample back (reference :36-55).  Dispatches
    on the watermarker: silentcipher-architecture models expose the
    encode_wav/decode_wav server API; the DSSS fallback exposes
    embed/decode."""
    audio = np.asarray(audio_array, dtype=np.float32)
    if sample_rate != _WM_SR:
        audio_44k = _resample(audio, sample_rate, _WM_SR)
    else:
        audio_44k = audio
    if hasattr(watermarker, "encode_wav"):
        encoded, *_ = watermarker.encode_wav(
            audio_44k, _WM_SR, watermark_key, calc_sdr=False, message_sdr=36
        )
        encoded = np.asarray(encoded)
    else:
        encoded = watermarker.embed(audio_44k, watermark_key)
    if sample_rate != _WM_SR:
        encoded = _resample(encoded, _WM_SR, sample_rate)
        encoded = encoded[:len(audio)]
    return encoded.astype(np.float32)


def verify(watermarker, watermarked_audio, sample_rate: int,
           watermark_key: List[int]) -> bool:
    """True iff the payload decodes to the given key (reference :59-78)."""
    audio = np.asarray(watermarked_audio, dtype=np.float32)
    if sample_rate != _WM_SR:
        audio = _resample(audio, sample_rate, _WM_SR)
    if hasattr(watermarker, "decode_wav"):
        result = watermarker.decode_wav(audio, _WM_SR,
                                        phase_shift_decoding=True)
        return bool(result["status"]
                    and result["messages"][0] == list(watermark_key))
    expect = Watermarker._key_bits(watermark_key) > 0
    got = watermarker.decode(audio, len(expect))
    if got is None:
        return False
    return bool(np.mean(got == expect.astype(np.uint8)) > 0.9)


def check_audio_from_file(audio_path: str, sample_rate: int = 24000) -> bool:
    """CLI helper (reference cli_check_audio, :14-19)."""
    from mlx_audio_tpu.utils.audio_io import load_audio

    audio = load_audio(audio_path, sample_rate)  # resample to the claimed
    # rate: verify() interprets samples at `sample_rate`
    wm = load_watermarker()
    is_marked = verify(wm, audio, sample_rate, CSM_1B_GH_WATERMARK)
    print("Watermarked" if is_marked else "Not watermarked")
    return is_marked


def main():  # pragma: no cover
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--audio_path", type=str, required=True)
    parser.add_argument("--sample_rate", type=int, default=24000)
    args = parser.parse_args()
    check_audio_from_file(args.audio_path, args.sample_rate)


if __name__ == "__main__":
    main()
