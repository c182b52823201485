"""Shared model contracts (reference: tts/models/base.py:8-84).

Every TTS model yields :class:`GenerationResult` records with the same
metrics schema as the reference so downstream tooling (CLI printers,
benchmarks) is drop-in compatible.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class BaseModelArgs:
    @classmethod
    def from_dict(cls, params: dict):
        """Construct, silently dropping unknown keys (tts/models/base.py:11)."""
        return cls(
            **{
                k: v
                for k, v in params.items()
                if k in inspect.signature(cls).parameters
            }
        )


def check_array_shape(arr) -> bool:
    """Heuristic: True if a 3-D conv weight already looks like
    [out_channels, kH, kW]-major (reference tts/models/base.py:21-34)."""
    if len(arr.shape) != 3:
        return False
    out_channels, kh, kw = arr.shape
    return (out_channels >= kh) and (out_channels >= kw) and (kh == kw)


def adjust_speed(audio: jax.Array, speed_factor: float) -> jax.Array:
    """Resample-based speed change (reference tts/models/base.py:37-68)."""
    audio = jnp.asarray(audio)
    old_length = audio.shape[0]
    new_length = int(old_length / speed_factor)
    new_idx = np.linspace(0, old_length - 1, new_length)
    lo = np.floor(new_idx).astype(np.int32)
    hi = np.minimum(lo + 1, old_length - 1)
    w_hi = jnp.asarray((new_idx - lo).astype(np.float32))
    shape = (-1,) + (1,) * (audio.ndim - 1)
    return (
        (1.0 - w_hi).reshape(shape) * audio[lo] + w_hi.reshape(shape) * audio[hi]
    )


@dataclass
class GenerationResult:
    """Per-segment TTS output + metrics (reference tts/models/base.py:71-84)."""

    audio: Any
    samples: int
    sample_rate: int
    segment_idx: int
    token_count: int
    audio_duration: str
    real_time_factor: float
    prompt: dict
    audio_samples: dict
    processing_time_seconds: float
    peak_memory_usage: float


def format_duration(seconds: float) -> str:
    hours = int(seconds // 3600)
    mins = int((seconds % 3600) // 60)
    secs = int(seconds % 60)
    ms = int((seconds % 1) * 1000)
    return f"{hours:02d}:{mins:02d}:{secs:02d}.{ms:03d}"


def peak_memory_gb() -> float:
    """Peak device memory in GB (best-effort; the reference reports
    mx.get_peak_memory, kokoro.py:342)."""
    try:
        dev = jax.devices()[0]
        stats = dev.memory_stats()
        if stats:
            return stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0)) / 1e9
    except Exception:
        pass
    return 0.0


def make_generation_result(
    audio: Any,
    sample_rate: int,
    segment_idx: int,
    token_count: int,
    segment_time: float,
) -> GenerationResult:
    """Assemble the standard metrics record for one generated segment."""
    audio = np.asarray(audio)
    samples = int(audio.shape[-1])
    audio_secs = samples / sample_rate
    rtf = segment_time / audio_secs if audio_secs > 0 else 0.0
    return GenerationResult(
        audio=audio,
        samples=samples,
        sample_rate=sample_rate,
        segment_idx=segment_idx,
        token_count=token_count,
        audio_duration=format_duration(audio_secs),
        real_time_factor=round(rtf, 2),
        prompt={
            "tokens": token_count,
            "tokens-per-sec": round(token_count / segment_time, 2) if segment_time > 0 else 0,
        },
        audio_samples={
            "samples": samples,
            "samples-per-sec": round(samples / segment_time, 2) if segment_time > 0 else 0,
        },
        processing_time_seconds=segment_time,
        peak_memory_usage=peak_memory_gb(),
    )
