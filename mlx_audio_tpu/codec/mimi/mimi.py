"""Mimi neural codec (Kyutai) — 24 kHz, 12.5 Hz frames, 32 RVQ codebooks.

Capability parity with /root/reference/mlx_audio/codec/models/mimi/mimi.py:
26-306, TPU-first:

* Batch encode/decode are pure jitted graphs (NLC, static shapes).
* Streaming encode/decode carry an explicit `MimiState` pytree; frame-by-
  frame decode is a `lax.scan` (`decode_frames`), replacing the reference's
  Python loop (mimi.py:302-306).
* Contracts (BASELINE.md): 5 s of 24 kHz -> codes (B, 32, 63) -> audio
  (B, 1, 120960).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from pathlib import Path
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.nn.module import Module, update_arrays
from mlx_audio_tpu.nn.streaming import StreamableConv1d, StreamableConvTranspose1d
from mlx_audio_tpu.codec.mimi.quantization import SplitResidualVectorQuantizer
from mlx_audio_tpu.codec.mimi.seanet import (
    SeanetConfig,
    SeanetDecoder,
    SeanetEncoder,
)
from mlx_audio_tpu.codec.mimi.transformer import (
    ProjectedTransformer,
    TransformerConfig,
)


@dataclass
class MimiConfig:
    channels: int
    sample_rate: float
    frame_rate: float
    renormalize: bool
    seanet: SeanetConfig
    transformer: TransformerConfig
    quantizer_nq: int
    quantizer_bins: int
    quantizer_dim: int


def mimi_202407(num_codebooks: int) -> MimiConfig:
    """The published Mimi architecture preset (reference mimi.py:39-88)."""
    seanet = SeanetConfig(
        dimension=512, channels=1, causal=True, nfilters=64,
        nresidual_layers=1, ratios=[8, 6, 5, 4], ksize=7, residual_ksize=3,
        last_ksize=3, dilation_base=2, pad_mode="constant", true_skip=True,
        compress=2,
    )
    transformer = TransformerConfig(
        d_model=seanet.dimension, num_heads=8, num_layers=8, causal=True,
        norm_first=True, bias_ff=False, bias_attn=False, layer_scale=0.01,
        positional_embedding="rope", use_conv_bias=True, gating=False,
        norm="layer_norm", context=250, max_period=10000, max_seq_len=8192,
        kv_repeat=1, dim_feedforward=2048, conv_layout=True,
    )
    return MimiConfig(
        channels=1, sample_rate=24000, frame_rate=12.5, renormalize=True,
        seanet=seanet, transformer=transformer, quantizer_nq=num_codebooks,
        quantizer_bins=2048, quantizer_dim=256,
    )


def mimi_from_hf_config(d: dict) -> MimiConfig:
    """MimiConfig from an HF-transformers `MimiConfig` dict (the layout
    embedded as `codec_config` in sesame/csm-1b checkpoints and shipped by
    kyutai/mimi).  Field mapping mirrors the golden-parity pair in
    tests/test_golden_hf.py::build_mimi_pair."""
    seanet = SeanetConfig(
        dimension=d.get("hidden_size", 512),
        channels=d.get("audio_channels", 1),
        causal=d.get("use_causal_conv", True),
        nfilters=d.get("num_filters", 64),
        nresidual_layers=d.get("num_residual_layers", 1),
        ratios=list(d.get("upsampling_ratios", [8, 6, 5, 4])),
        ksize=d.get("kernel_size", 7),
        residual_ksize=d.get("residual_kernel_size", 3),
        last_ksize=d.get("last_kernel_size", 3),
        dilation_base=d.get("dilation_growth_rate", 2),
        pad_mode="constant",
        true_skip=True,
        compress=d.get("compress", 2),
    )
    transformer = TransformerConfig(
        d_model=seanet.dimension,
        num_heads=d.get("num_attention_heads", 8),
        num_layers=d.get("num_hidden_layers", 8),
        causal=True, norm_first=True, bias_ff=False, bias_attn=False,
        layer_scale=d.get("layer_scale_initial_scale", 0.01),
        positional_embedding="rope",
        use_conv_bias=True, gating=False, norm="layer_norm",
        context=d.get("sliding_window", 250),
        max_period=int(d.get("rope_theta", 10000)),
        max_seq_len=8192, kv_repeat=1,
        dim_feedforward=d.get("intermediate_size", 2048),
        conv_layout=True,
    )
    return MimiConfig(
        channels=d.get("audio_channels", 1),
        sample_rate=d.get("sampling_rate", 24000),
        frame_rate=d.get("frame_rate", 12.5),
        renormalize=d.get("normalize", False),
        seanet=seanet,
        transformer=transformer,
        quantizer_nq=d.get("num_quantizers", 32),
        quantizer_bins=d.get("codebook_size", 2048),
        quantizer_dim=d.get("vector_quantization_hidden_dimension", 256),
    )


class MimiState(NamedTuple):
    """Streaming carry: conv states + transformer rotating caches."""

    encoder: any
    encoder_tf: any
    downsample: any
    decoder: any
    decoder_tf: any
    upsample: any


class Mimi(Module):
    def __init__(self, cfg: MimiConfig):
        dim = cfg.seanet.dimension
        self.cfg = cfg
        encoder_frame_rate = cfg.sample_rate / math.prod(cfg.seanet.ratios)
        downsample_stride = int(encoder_frame_rate / cfg.frame_rate)
        self.downsample_stride = downsample_stride
        self.samples_per_frame = int(cfg.sample_rate / cfg.frame_rate)
        self.encoder = SeanetEncoder(cfg.seanet)
        self.decoder = SeanetDecoder(cfg.seanet)
        self.quantizer = SplitResidualVectorQuantizer(
            dim=cfg.quantizer_dim, input_dim=dim, output_dim=dim,
            nq=cfg.quantizer_nq, bins=cfg.quantizer_bins,
        )
        self.encoder_transformer = ProjectedTransformer(
            cfg.transformer, input_dim=dim, output_dims=[dim]
        )
        self.decoder_transformer = ProjectedTransformer(
            cfg.transformer, input_dim=dim, output_dims=[dim]
        )
        self.downsample = StreamableConv1d(
            dim, dim, 2 * downsample_stride, stride=downsample_stride,
            bias=False, causal=True, pad_mode="edge",
        )
        self.upsample = StreamableConvTranspose1d(
            dim, dim, 2 * downsample_stride, stride=downsample_stride,
            groups=dim, bias=False, causal=True,
        )

    @property
    def frame_rate(self) -> float:
        return self.cfg.frame_rate

    @property
    def sample_rate(self) -> float:
        return self.cfg.sample_rate

    # -- batch paths (jitted with the codec as a pytree argument: calling
    # the pure bodies eagerly re-traces with the weights baked in as
    # constants — measured seconds per call over the device tunnel) -------

    def encode(self, audio: jax.Array) -> jax.Array:
        """[B, 1, T] (or [B, T, 1] NLC) -> codes [B, nq, frames]."""
        return _encode_jit(self, audio)

    def decode(self, codes: jax.Array) -> jax.Array:
        """codes [B, nq, frames] -> audio [B, 1, frames*1920] (NCL, as ref)."""
        return _decode_jit(self, codes)

    def _encode_impl(self, audio: jax.Array) -> jax.Array:
        if audio.shape[1] == self.cfg.channels and audio.ndim == 3 and audio.shape[1] < audio.shape[2]:
            audio = jnp.swapaxes(audio, 1, 2)  # NCL -> NLC
        x = self.encoder(audio)
        x = self.encoder_transformer(x)[0]
        x = self.downsample(x)
        return self.quantizer.encode(x)

    def _decode_impl(self, codes: jax.Array) -> jax.Array:
        x = self.quantizer.decode(codes)
        x = self.upsample(x)
        x = self.decoder_transformer(x)[0]
        audio = self.decoder(x)
        return jnp.swapaxes(audio, 1, 2)  # NLC -> NCL contract

    # -- streaming ---------------------------------------------------------

    def init_state(self, batch: int, dtype=jnp.float32) -> MimiState:
        return MimiState(
            encoder=self.encoder.init_state(batch, dtype),
            encoder_tf=self.encoder_transformer.init_cache(batch, dtype),
            downsample=self.downsample.init_state(batch, dtype),
            decoder=self.decoder.init_state(batch, dtype),
            decoder_tf=self.decoder_transformer.init_cache(batch, dtype),
            upsample=self.upsample.init_state(batch, dtype),
        )

    def encode_step(self, state: MimiState, audio: jax.Array):
        """One 1920-sample frame [B, 1920, 1] -> (codes [B, nq, 1], state)."""
        x, enc_s = self.encoder.step(state.encoder, audio)
        outs, tf_s = self.encoder_transformer.step(state.encoder_tf, x)
        x, ds_s = self.downsample.step(state.downsample, outs[0])
        codes = self.quantizer.encode(x)
        new_state = state._replace(encoder=enc_s, encoder_tf=tf_s, downsample=ds_s)
        return codes, new_state

    def decode_step(self, state: MimiState, codes: jax.Array):
        """codes [B, nq, 1] -> (audio [B, 1920, 1], state)."""
        x = self.quantizer.decode(codes)
        x, up_s = self.upsample.step(state.upsample, x)
        outs, tf_s = self.decoder_transformer.step(state.decoder_tf, x)
        audio, dec_s = self.decoder.step(state.decoder, outs[0])
        new_state = state._replace(upsample=up_s, decoder_tf=tf_s, decoder=dec_s)
        return audio, new_state

    def decode_frames(self, codes: jax.Array,
                      state: Optional[MimiState] = None) -> jax.Array:
        """Streaming decode of [B, nq, T] via lax.scan -> audio [B, 1, T*1920]
        (replaces the reference's Python frame loop, mimi.py:302-306)."""
        if state is None:
            state = self.init_state(codes.shape[0])
        return self.decode_frames_stateful(codes, state)[0]

    def decode_frames_stateful(self, codes: jax.Array, state: MimiState):
        """Like decode_frames, but takes and returns the streaming state so
        successive chunks continue one stream (CSM streaming yields)."""
        return _decode_frames_stateful_jit(self, codes, state)

    def _decode_frames_stateful_impl(self, codes: jax.Array, state: MimiState):
        b, nq, t = codes.shape

        def step_fn(carry, frame_codes):
            audio, carry = self.decode_step(carry, frame_codes[..., None])
            return carry, audio

        frames = jnp.moveaxis(codes, -1, 0)
        state, audio = jax.lax.scan(step_fn, state, frames)
        audio = jnp.moveaxis(audio[..., 0], 0, 1).reshape(b, -1)
        return audio[:, None, :], state

    def warmup(self):
        pcm = jnp.zeros((1, 1, self.samples_per_frame * 4))
        jax.block_until_ready(self.decode(self.encode(pcm)))

    # -- checkpoint loading ------------------------------------------------

    def sanitize(self, weights: dict) -> dict:
        if any("_transformer.layers." in k and ".self_attn.q_proj." in k
               for k in weights):
            return sanitize_hf_mimi(
                weights,
                n_heads=self.cfg.transformer.num_heads,
                n_ratios=len(self.cfg.seanet.ratios),
            )
        return sanitize_mimi(weights)

    def load_pytorch_weights(self, path: str) -> "Mimi":
        from safetensors.numpy import load_file

        return update_arrays(self, sanitize_mimi(load_file(path)), strict=False)

    @classmethod
    def from_pretrained(cls, path_or_repo: str = "kyutai/mimi",
                        filename: Optional[str] = None) -> "Mimi":
        """Load from an HF-transformers MimiModel directory (kyutai/mimi:
        config.json + model.safetensors) or a single Kyutai moshi-style
        safetensors file (reference mimi.py:252-261)."""
        from mlx_audio_tpu.codec.loading import (
            fetch_from_hub,
            load_config,
            load_safetensors,
        )

        p = Path(path_or_repo)
        if p.is_file() and p.suffix == ".safetensors":
            return cls(mimi_202407(32)).load_pytorch_weights(str(p))
        path = fetch_from_hub(path_or_repo)
        if filename is not None:
            return cls(mimi_202407(32)).load_pytorch_weights(
                str(path / filename)
            )
        cfg = mimi_from_hf_config(load_config(path))
        model = cls(cfg)
        weights = load_safetensors(path)
        return update_arrays(model, model.sanitize(weights), strict=False)


def sanitize_mimi(weights: dict) -> dict:
    """Map the Kyutai torch checkpoint keys/layouts to our paths.

    Port of the remapping at reference mimi.py:184-249 with NLC layouts:
    conv [O, I, K] -> [K, I, O]; convT [I, O, K] -> [K, I, O]; 1x1 projs
    -> Linear [O, I].
    """
    out = {}
    for k, v in weights.items():
        v = np.asarray(v)
        k = ".".join(s.removeprefix("_") for s in k.split("."))
        k = k.replace("encoder.model.", "encoder.")
        k = k.replace("decoder.model.", "decoder.")
        k = k.replace(".in_proj_weight", ".in_proj.weight")
        k = k.replace(".linear1.weight", ".gating.linear1.weight")
        k = k.replace(".linear2.weight", ".gating.linear2.weight")
        for layer_idx, dec_idx in enumerate([2, 5, 8, 11]):
            k = k.replace(f"decoder.{dec_idx}.", f"decoder.layers.{layer_idx}.upsample.")
            k = k.replace(f"decoder.{dec_idx + 1}.", f"decoder.layers.{layer_idx}.residuals.0.")
        for layer_idx, enc_idx in enumerate([1, 4, 7, 10]):
            k = k.replace(f"encoder.{enc_idx}.", f"encoder.layers.{layer_idx}.residuals.0.")
            k = k.replace(f"encoder.{enc_idx + 2}.", f"encoder.layers.{layer_idx}.downsample.")
        k = k.replace("decoder.0.", "decoder.init_conv1d.")
        k = k.replace("decoder.14.", "decoder.final_conv1d.")
        k = k.replace("encoder.0.", "encoder.init_conv1d.")
        k = k.replace("encoder.14.", "encoder.final_conv1d.")
        k = k.replace(".block.1.", ".block.0.")
        k = k.replace(".block.3.", ".block.1.")
        # collapse the reference's conv.conv / convtr.convtr nesting — our
        # streaming convs hold weights directly
        k = k.replace(".conv.conv.", ".").replace(".convtr.convtr.", ".")
        k = k.replace(".conv.weight", ".weight").replace(".conv.bias", ".bias")
        k = k.replace(".convtr.weight", ".weight").replace(".convtr.bias", ".bias")

        if (k.endswith("input_proj.weight") or k.endswith("output_proj.weight")) and v.ndim == 3:
            # 1x1 conv [O, I, 1] -> Linear [O, I]
            v = v[..., 0]
        elif k.endswith(".weight") and v.ndim == 3:
            if ".upsample." in k or k.startswith("upsample."):
                # torch convT [in, out/groups, k] -> [k, in, out/groups]
                v = v.transpose(2, 0, 1)
            else:
                # torch conv [out, in, k] -> [k, in, out]
                v = v.transpose(2, 1, 0)
        out[k] = v
    return out


def _unpermute_rope(w: np.ndarray, n_heads: int) -> np.ndarray:
    """HF rotate-half q/k layout -> interleaved-pair layout (inverse of the
    GPT-NeoX->HF permutation the transformers conversion script applies).
    Our RoPE is the original Kyutai interleaved convention."""
    o, i = w.shape
    hd = o // n_heads
    return w.reshape(n_heads, 2, hd // 2, i).swapaxes(1, 2).reshape(o, i)


def sanitize_hf_mimi(weights: dict, n_heads: int = 8,
                     n_ratios: int = 4) -> dict:
    """Map HF-transformers `MimiModel` checkpoint keys/layouts to our paths
    (e.g. `kyutai/mimi`).  Golden parity with `transformers.MimiModel` is
    tested in tests/test_golden_hf.py: identical codes, waveform allclose.

    HF SEANet indexing: encoder layers 0=init, 3i+1=resblock, 3i+3=down,
    3*nr+2=final; decoder 0=init, 3i+2=upsample, 3i+3=resblock, 3*nr+2=final
    (ELUs occupy the gaps).  HF q/k projections carry the rotate-half RoPE
    permutation, inverted here.
    """
    out = {}
    qkv: dict[str, np.ndarray] = {}
    for k, v in weights.items():
        v = np.asarray(v)
        if "_transformer.layers." in k and ".self_attn." in k and any(
            p in k for p in ("q_proj", "k_proj", "v_proj")
        ):
            qkv[k] = v
            continue
        for side in ("encoder", "decoder"):
            if not k.startswith(side + ".layers."):
                continue
            parts = k.split(".")
            idx = int(parts[2])
            rest = ".".join(parts[3:])
            if rest.startswith("conv."):
                rest = rest[len("conv."):]
            rest = rest.replace("block.1.conv.", "block.0.")
            rest = rest.replace("block.3.conv.", "block.1.")
            if idx == 0:
                k = f"{side}.init_conv1d.{rest}"
            elif idx == 3 * n_ratios + 2:
                k = f"{side}.final_conv1d.{rest}"
            elif side == "encoder" and (idx - 1) % 3 == 0:
                k = f"encoder.layers.{(idx - 1) // 3}.residuals.0.{rest}"
            elif side == "encoder":
                k = f"encoder.layers.{(idx - 3) // 3}.downsample.{rest}"
            elif (idx - 2) % 3 == 0:
                k = f"decoder.layers.{(idx - 2) // 3}.upsample.{rest}"
            else:
                k = f"decoder.layers.{(idx - 3) // 3}.residuals.0.{rest}"
            break
        k = k.replace(".self_attn.o_proj.", ".self_attn.out_proj.")
        k = k.replace(".mlp.fc1.", ".gating.linear1.")
        k = k.replace(".mlp.fc2.", ".gating.linear2.")
        k = k.replace(".input_layernorm.", ".norm1.")
        k = k.replace(".post_attention_layernorm.", ".norm2.")
        k = k.replace(".self_attn_layer_scale.scale", ".layer_scale_1.scale")
        k = k.replace(".mlp_layer_scale.scale", ".layer_scale_2.scale")
        k = k.replace("semantic_residual_vector_quantizer", "rvq_first")
        k = k.replace("acoustic_residual_vector_quantizer", "rvq_rest")
        k = k.replace(".codebook.embed_sum", ".codebook.embedding_sum")
        k = k.replace(".rvq_first.layers.", ".rvq_first.vq.layers.")
        k = k.replace(".rvq_rest.layers.", ".rvq_rest.vq.layers.")
        if k == "downsample.conv.weight":
            k = "downsample.weight"
        if k == "upsample.conv.weight":
            k = "upsample.weight"
        if ("rvq" in k and v.ndim == 3
                and (k.endswith("input_proj.weight")
                     or k.endswith("output_proj.weight"))):
            v = v[..., 0]  # 1x1 conv -> Linear [O, I]
        elif k.endswith(".weight") and v.ndim == 3:
            if ".upsample." in k or k == "upsample.weight":
                v = v.transpose(2, 0, 1)  # convT [I, O/g, K] -> [K, I, O/g]
            else:
                v = v.transpose(2, 1, 0)  # conv [O, I, K] -> [K, I, O]
        out[k] = v
    for k, q in qkv.items():
        if "q_proj" not in k:
            continue
        pre = k[: -len("q_proj.weight")]
        kk = qkv[pre + "k_proj.weight"]
        vv = qkv[pre + "v_proj.weight"]
        out[pre + "in_proj.weight"] = np.concatenate(
            [_unpermute_rope(q, n_heads), _unpermute_rope(kk, n_heads), vv],
            axis=0,
        )
    return out


# -- jitted entry points (codec passed as a pytree argument so weights are
# traced inputs, not baked constants; cached across calls) -----------------


@jax.jit
def _encode_jit(codec: Mimi, audio: jax.Array) -> jax.Array:
    return codec._encode_impl(audio)


@jax.jit
def _decode_jit(codec: Mimi, codes: jax.Array) -> jax.Array:
    return codec._decode_impl(codes)


@jax.jit
def _decode_frames_stateful_jit(codec: Mimi, codes: jax.Array,
                                state: MimiState):
    return codec._decode_frames_stateful_impl(codes, state)
