"""Centralized neural building blocks (the reference duplicates these per
model family — SURVEY.md layer 2; here they live in one library)."""

from mlx_audio_tpu.nn.module import (
    Module,
    map_arrays,
    named_arrays,
    update_arrays,
)

__all__ = ["Module", "named_arrays", "update_arrays", "map_arrays"]
