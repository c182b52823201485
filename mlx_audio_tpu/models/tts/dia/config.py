"""Dia configuration (capability parity with /root/reference/mlx_audio/tts/
models/dia/config.py:22-256)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List


@dataclass
class DataConfig:
    text_length: int = 1024
    audio_length: int = 3072
    channels: int = 9
    text_pad_value: int = 0
    audio_eos_value: int = 1024
    audio_pad_value: int = 1025
    audio_bos_value: int = 1026
    delay_pattern: List[int] = field(
        default_factory=lambda: [0, 8, 9, 10, 11, 12, 13, 14, 15]
    )


@dataclass
class EncoderConfig:
    n_layer: int = 12
    n_embd: int = 1024
    n_hidden: int = 4096
    n_head: int = 16
    head_dim: int = 128
    mlp_activations: List[str] = field(default_factory=lambda: ["silu", "linear"])
    use_pre_norm: bool = False


@dataclass
class DecoderConfig:
    n_layer: int = 18
    n_embd: int = 2048
    n_hidden: int = 8192
    gqa_query_heads: int = 16
    kv_heads: int = 4
    gqa_head_dim: int = 128
    cross_query_heads: int = 16
    cross_head_dim: int = 128
    mlp_activations: List[str] = field(default_factory=lambda: ["silu", "linear"])
    use_pre_norm: bool = False


@dataclass
class DiaModelConfig:
    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    decoder: DecoderConfig = field(default_factory=DecoderConfig)
    src_vocab_size: int = 128
    tgt_vocab_size: int = 1028
    dropout: float = 0.0
    normalization_layer_epsilon: float = 1e-5
    rope_min_timescale: float = 1.0
    rope_max_timescale: float = 10000.0
    sample_rate: int = 44100


@dataclass
class DiaConfig:
    data: DataConfig = field(default_factory=DataConfig)
    model: DiaModelConfig = field(default_factory=DiaModelConfig)

    @classmethod
    def load_dict(cls, d: dict) -> "DiaConfig":
        def sub(klass, key, parent):
            src = parent.get(key, {}) or {}
            valid = klass.__dataclass_fields__
            return klass(**{k: v for k, v in src.items() if k in valid})

        data = sub(DataConfig, "data", d)
        model_d = d.get("model", {}) or {}
        enc = sub(EncoderConfig, "encoder", model_d)
        dec = sub(DecoderConfig, "decoder", model_d)
        valid = DiaModelConfig.__dataclass_fields__
        model = DiaModelConfig(
            encoder=enc, decoder=dec,
            **{k: v for k, v in model_d.items()
               if k in valid and k not in ("encoder", "decoder")},
        )
        # sample_rate may live at the top level
        if "sample_rate" in d:
            model.sample_rate = d["sample_rate"]
        return cls(data=data, model=model)
