"""Dia delay-pattern utilities — pure vectorized gathers.

Capability parity with /root/reference/mlx_audio/tts/models/dia/audio.py:
8-287 (whose gather_nd is a Python loop; here one jnp.take_along_axis)."""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np


def apply_audio_delay(audio_btc: jax.Array, pad_value: int, bos_value: int,
                      delay_pattern: List[int]) -> jax.Array:
    """out[b, t, c] = in[b, t - delay[c], c]; BOS where t < delay, PAD where
    t - delay >= T."""
    b, t, c = audio_btc.shape
    delay = jnp.asarray(delay_pattern)[None, None, :]
    t_idx = jnp.arange(t)[None, :, None] - delay      # [1, T, C]
    clamped = jnp.clip(t_idx, 0, t - 1)
    gathered = jnp.take_along_axis(
        audio_btc, jnp.broadcast_to(clamped, (b, t, c)), axis=1
    )
    out = jnp.where(t_idx < 0, bos_value, gathered)
    return jnp.where(t_idx >= t, pad_value, out)


def revert_audio_delay(audio_btc: jax.Array, pad_value: int,
                       delay_pattern: List[int], t_orig: int) -> jax.Array:
    """out[b, t, c] = in[b, t + delay[c], c]; PAD beyond the original length."""
    b, t, c = audio_btc.shape
    delay = jnp.asarray(delay_pattern)[None, None, :]
    t_idx = jnp.arange(t)[None, :, None] + delay
    clamped = jnp.minimum(t_idx, t - 1)
    gathered = jnp.take_along_axis(
        audio_btc, jnp.broadcast_to(clamped, (b, t, c)), axis=1
    )
    return jnp.where(t_idx >= t_orig, pad_value, gathered)


def audio_to_codebook(dac_model, audio, data_config):
    """Encode audio with DAC and apply the per-channel delay (audio.py:98-145).
    audio: [B, 1, T] -> delayed codes [B, T', C]."""
    _, codes, _ = dac_model.encode(audio)  # [B, C, T']
    codes_btc = jnp.swapaxes(codes, 1, 2)
    return apply_audio_delay(
        codes_btc, data_config.audio_pad_value, data_config.audio_bos_value,
        data_config.delay_pattern,
    )


def codebook_to_audio(generated_codes, dac_model, delay_pattern,
                      c: int = 9) -> np.ndarray:
    """[C, T] delayed codes (incl. BOS col) -> waveform (audio.py:246-287)."""
    return codebook_to_audio_batch([generated_codes], dac_model,
                                   delay_pattern, c)[0]


def codebook_to_audio_batch(codes_list, dac_model, delay_pattern,
                            c: int = 9) -> list:
    """Batched delay-revert + DAC synthesis: rows with equal code lengths
    decode through ONE `decode_codes` call (exact — same ops, stacked;
    the per-row dispatch was ~40% of the Dia e2e wall at batch 8, the
    same shape as the round-4 IndexTTS/Bark vocoder batching fixes).
    Ragged lengths fall into per-length groups."""
    out = [None] * len(codes_list)
    groups = {}
    for i, g in enumerate(codes_list):
        groups.setdefault(g.shape[1], []).append(i)
    # cap the vocoder sub-batch: DAC's upsampled conv activations scale
    # with rows (~1 GB f32 per 16 rows at 4 s) and a 32-row group OOMs
    # next to the resident decoder — 16 keeps the dispatch-batching win
    # with bounded activation memory
    groups = {
        (t, j): idxs[j * 16: (j + 1) * 16]
        for t, idxs in groups.items()
        for j in range(-(-len(idxs) // 16))
    }
    for (t_full, _), idxs in groups.items():
        batch = np.stack([np.asarray(codes_list[i]) for i in idxs])
        codes = batch[:, :, 1:]                    # drop BOS col
        t = codes.shape[2]
        reverted = revert_audio_delay(
            jnp.asarray(codes.transpose(0, 2, 1)), pad_value=0,
            delay_pattern=delay_pattern, t_orig=t,
        )
        reverted = (reverted[:, :-30, :] if reverted.shape[1] > 30
                    else reverted)
        codebook = jnp.swapaxes(reverted, 1, 2)    # [G, C, T]
        codebook = jnp.where((codebook < 0) | (codebook > 1023), 0, codebook)
        audio = np.asarray(dac_model.decode_codes(codebook))  # [G, 1, S]
        for j, i in enumerate(idxs):
            out[i] = audio[j, 0]
    return out
