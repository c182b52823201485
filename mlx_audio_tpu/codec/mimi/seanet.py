"""SEANet encoder/decoder (Mimi's conv backbone), batch + streaming.

Capability parity with /root/reference/mlx_audio/codec/models/mimi/modules/
seanet.py:13-314, NLC layout.  Streaming state is a nested pytree of conv
carries returned by ``init_state`` and threaded through ``step``; chunk
sizes in Mimi are exact frame multiples, so the reference's StreamingAdd
ragged-chunk machinery (seanet.py:30-51) is unnecessary — both branches of
every residual always align.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from mlx_audio_tpu.nn.module import Module
from mlx_audio_tpu.nn.streaming import StreamableConv1d, StreamableConvTranspose1d


@dataclass
class SeanetConfig:
    dimension: int
    channels: int
    causal: bool
    nfilters: int
    nresidual_layers: int
    ratios: list
    ksize: int
    residual_ksize: int
    last_ksize: int
    dilation_base: int
    pad_mode: str
    true_skip: bool
    compress: int


def elu(x: jax.Array) -> jax.Array:
    return jax.nn.elu(x, alpha=1.0)


class SeanetResnetBlock(Module):
    def __init__(self, cfg: SeanetConfig, dim: int, ksizes_and_dilations: list):
        hidden = dim // cfg.compress
        block = []
        for i, (ksize, dilation) in enumerate(ksizes_and_dilations):
            in_ch = dim if i == 0 else hidden
            out_ch = dim if i == len(ksizes_and_dilations) - 1 else hidden
            block.append(
                StreamableConv1d(
                    in_ch, out_ch, ksize, stride=1, dilation=dilation,
                    causal=cfg.causal, pad_mode=cfg.pad_mode,
                )
            )
        self.block = block
        if cfg.true_skip:
            self.shortcut = None
        else:
            self.shortcut = StreamableConv1d(
                dim, dim, 1, stride=1, causal=cfg.causal, pad_mode=cfg.pad_mode
            )

    def __call__(self, x: jax.Array) -> jax.Array:
        residual = x
        for conv in self.block:
            x = conv(elu(x))
        if self.shortcut is None:
            return x + residual
        return x + self.shortcut(residual)

    def init_state(self, batch: int, dtype=jnp.float32):
        state = {"block": [c.init_state(batch, dtype) for c in self.block]}
        if self.shortcut is not None:
            state["shortcut"] = self.shortcut.init_state(batch, dtype)
        return state

    def step(self, state, x: jax.Array):
        residual = x
        new_block = []
        for conv, s in zip(self.block, state["block"]):
            x, s = conv.step(s, elu(x))
            new_block.append(s)
        new_state = {"block": new_block}
        if self.shortcut is None:
            out = x + residual
        else:
            sc, s = self.shortcut.step(state["shortcut"], residual)
            new_state["shortcut"] = s
            out = x + sc
        return out, new_state


class EncoderLayer(Module):
    def __init__(self, cfg: SeanetConfig, ratio: int, mult: int):
        residuals = []
        dilation = 1
        for _ in range(cfg.nresidual_layers):
            residuals.append(
                SeanetResnetBlock(
                    cfg, dim=mult * cfg.nfilters,
                    ksizes_and_dilations=[(cfg.residual_ksize, dilation), (1, 1)],
                )
            )
            dilation *= cfg.dilation_base
        self.residuals = residuals
        self.downsample = StreamableConv1d(
            mult * cfg.nfilters, mult * cfg.nfilters * 2, ratio * 2,
            stride=ratio, causal=True, pad_mode=cfg.pad_mode,
        )

    def __call__(self, x):
        for r in self.residuals:
            x = r(x)
        return self.downsample(elu(x))

    def init_state(self, batch, dtype=jnp.float32):
        return {
            "residuals": [r.init_state(batch, dtype) for r in self.residuals],
            "downsample": self.downsample.init_state(batch, dtype),
        }

    def step(self, state, x):
        rs = []
        for r, s in zip(self.residuals, state["residuals"]):
            x, s = r.step(s, x)
            rs.append(s)
        x, ds = self.downsample.step(state["downsample"], elu(x))
        return x, {"residuals": rs, "downsample": ds}


class SeanetEncoder(Module):
    def __init__(self, cfg: SeanetConfig):
        mult = 1
        self.init_conv1d = StreamableConv1d(
            cfg.channels, mult * cfg.nfilters, cfg.ksize, stride=1,
            causal=cfg.causal, pad_mode=cfg.pad_mode,
        )
        layers = []
        for ratio in reversed(cfg.ratios):
            layers.append(EncoderLayer(cfg, ratio=ratio, mult=mult))
            mult *= 2
        self.layers = layers
        self.final_conv1d = StreamableConv1d(
            mult * cfg.nfilters, cfg.dimension, cfg.last_ksize, stride=1,
            causal=cfg.causal, pad_mode=cfg.pad_mode,
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        """[B, T, 1] -> [B, T/960, dimension] (for the 24 kHz config)."""
        x = self.init_conv1d(x)
        for layer in self.layers:
            x = layer(x)
        return self.final_conv1d(elu(x))

    def init_state(self, batch, dtype=jnp.float32):
        return {
            "init": self.init_conv1d.init_state(batch, dtype),
            "layers": [l.init_state(batch, dtype) for l in self.layers],
            "final": self.final_conv1d.init_state(batch, dtype),
        }

    def step(self, state, x):
        x, si = self.init_conv1d.step(state["init"], x)
        ls = []
        for layer, s in zip(self.layers, state["layers"]):
            x, s = layer.step(s, x)
            ls.append(s)
        x, sf = self.final_conv1d.step(state["final"], elu(x))
        return x, {"init": si, "layers": ls, "final": sf}


class DecoderLayer(Module):
    def __init__(self, cfg: SeanetConfig, ratio: int, mult: int):
        self.upsample = StreamableConvTranspose1d(
            mult * cfg.nfilters, mult * cfg.nfilters // 2, ratio * 2,
            stride=ratio, causal=cfg.causal,
        )
        residuals = []
        dilation = 1
        for _ in range(cfg.nresidual_layers):
            residuals.append(
                SeanetResnetBlock(
                    cfg, dim=mult * cfg.nfilters // 2,
                    ksizes_and_dilations=[(cfg.residual_ksize, dilation), (1, 1)],
                )
            )
            dilation *= cfg.dilation_base
        self.residuals = residuals

    def __call__(self, x):
        x = self.upsample(elu(x))
        for r in self.residuals:
            x = r(x)
        return x

    def init_state(self, batch, dtype=jnp.float32):
        return {
            "upsample": self.upsample.init_state(batch, dtype),
            "residuals": [r.init_state(batch, dtype) for r in self.residuals],
        }

    def step(self, state, x):
        x, us = self.upsample.step(state["upsample"], elu(x))
        rs = []
        for r, s in zip(self.residuals, state["residuals"]):
            x, s = r.step(s, x)
            rs.append(s)
        return x, {"upsample": us, "residuals": rs}


class SeanetDecoder(Module):
    def __init__(self, cfg: SeanetConfig):
        mult = 1 << len(cfg.ratios)
        self.init_conv1d = StreamableConv1d(
            cfg.dimension, mult * cfg.nfilters, cfg.ksize, stride=1,
            causal=cfg.causal, pad_mode=cfg.pad_mode,
        )
        layers = []
        for ratio in cfg.ratios:
            layers.append(DecoderLayer(cfg, ratio=ratio, mult=mult))
            mult //= 2
        self.layers = layers
        self.final_conv1d = StreamableConv1d(
            cfg.nfilters, cfg.channels, cfg.last_ksize, stride=1,
            causal=cfg.causal, pad_mode=cfg.pad_mode,
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        x = self.init_conv1d(x)
        for layer in self.layers:
            x = layer(x)
        return self.final_conv1d(elu(x))

    def init_state(self, batch, dtype=jnp.float32):
        return {
            "init": self.init_conv1d.init_state(batch, dtype),
            "layers": [l.init_state(batch, dtype) for l in self.layers],
            "final": self.final_conv1d.init_state(batch, dtype),
        }

    def step(self, state, x):
        x, si = self.init_conv1d.step(state["init"], x)
        ls = []
        for layer, s in zip(self.layers, state["layers"]):
            x, s = layer.step(s, x)
            ls.append(s)
        x, sf = self.final_conv1d.step(state["final"], elu(x))
        return x, {"init": si, "layers": ls, "final": sf}
