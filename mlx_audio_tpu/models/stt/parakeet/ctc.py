"""Parakeet CTC head (reference ctc.py:19-34)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

import jax
import jax.numpy as jnp

from mlx_audio_tpu.nn import Conv1d, Module


@dataclass
class ConvASRDecoderArgs:
    feat_in: int
    num_classes: int
    vocabulary: List[str]


@dataclass
class AuxCTCArgs:
    decoder: ConvASRDecoderArgs


class ConvASRDecoder(Module):
    def __init__(self, args: ConvASRDecoderArgs):
        num_classes = (
            len(args.vocabulary) if args.num_classes <= 0 else args.num_classes
        ) + 1
        self.decoder_layers = [Conv1d(args.feat_in, num_classes, 1, bias=True)]
        self.temperature = 1.0

    def __call__(self, x: jax.Array) -> jax.Array:
        return jax.nn.log_softmax(self.decoder_layers[0](x) / self.temperature)
