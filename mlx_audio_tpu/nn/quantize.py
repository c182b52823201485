"""Weight-only affine quantization (capability parity with the reference's
``nn.quantize`` path, /root/reference/mlx_audio/tts/utils.py:326-421 and
convert-time mixed recipes).

TPU design: grouped affine codes ``w ~= scales * q + biases`` held as uint8
and dequantized inside the matmul in the activation dtype, so XLA fuses the
expand into the MXU feed.  Codes of <= 4 bits pack two per byte in
"concat-half" layout — byte ``j`` holds column ``j`` in the low nibble and
column ``j + I/2`` in the high nibble, so unpacking is a concat of two
shift/mask views (no interleave, Mosaic-friendly) — making int4 genuinely
half the resident bytes of int8 (4x less than bf16).  Quantized modules are
drop-in pytree replacements for Linear/Embedding: same call signatures, same
attribute paths for the surrounding tree.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .layers import Embedding, Linear
from .module import Module

__all__ = [
    "QuantizedLinear", "QuantizedEmbedding", "quantize_model",
    "dequantize_model", "mixed_quant_predicate_builder", "QUANT_RECIPES",
]

QUANT_RECIPES = ["mixed_2_6", "mixed_3_4", "mixed_3_6", "mixed_4_6"]


def _affine_quantize(w: np.ndarray, group_size: int, bits: int):
    """w [O, I] -> (codes uint8 [O, I], scales [O, I/gs], biases [O, I/gs])."""
    o, i = w.shape
    assert i % group_size == 0, f"in_features {i} % group_size {group_size}"
    g = w.reshape(o, i // group_size, group_size).astype(np.float32)
    lo = g.min(axis=-1)
    hi = g.max(axis=-1)
    n_levels = (1 << bits) - 1
    scales = np.maximum((hi - lo) / n_levels, 1e-8)
    biases = lo
    q = np.clip(np.round((g - lo[..., None]) / scales[..., None]),
                0, n_levels).astype(np.uint8)
    return q.reshape(o, i), scales, biases


def _affine_dequantize(q, scales, biases, group_size: int):
    o, i = q.shape
    g = q.reshape(o, i // group_size, group_size).astype(scales.dtype)
    w = g * scales[..., None] + biases[..., None]
    return w.reshape(o, i)


def _packable(bits: int, in_dim: int) -> bool:
    """<=4-bit codes fit a nibble; packing needs an even minor dim."""
    return bits <= 4 and in_dim % 2 == 0


def _pack4(q: np.ndarray) -> np.ndarray:
    """[..., I] uint8 nibble codes -> [..., I/2] concat-half packed bytes."""
    half = q.shape[-1] // 2
    return (q[..., :half] | (q[..., half:] << 4)).astype(np.uint8)


def _unpack4(qp):
    """Inverse of :func:`_pack4`; works on numpy or jax arrays."""
    xp = jnp if isinstance(qp, jax.Array) else np
    return xp.concatenate([qp & 0xF, qp >> 4], axis=-1)


class QuantizedLinear(Module):
    """y = x @ dequant(W)^T + b; drop-in for Linear."""

    def __init__(self, in_features: int, out_features: int, bias: bool = True,
                 group_size: int = 64, bits: int = 4):
        self.group_size = group_size
        self.bits = bits
        self.packed = _packable(bits, in_features)
        stored = in_features // 2 if self.packed else in_features
        self.weight = jnp.zeros((out_features, stored), dtype=jnp.uint8)
        self.scales = jnp.ones((out_features, in_features // group_size),
                               dtype=jnp.float32)
        self.biases = jnp.zeros((out_features, in_features // group_size),
                                dtype=jnp.float32)
        self.bias = jnp.zeros((out_features,)) if bias else None

    @property
    def in_features(self) -> int:
        return self.scales.shape[1] * self.group_size

    @classmethod
    def from_linear(cls, lin: Linear, group_size: int = 64,
                    bits: int = 4) -> "QuantizedLinear":
        w = np.asarray(lin.weight)
        qe = cls(w.shape[1], w.shape[0], bias=lin.bias is not None,
                 group_size=group_size, bits=bits)
        q, s, b = _affine_quantize(w, group_size, bits)
        qe.weight = jnp.asarray(_pack4(q) if qe.packed else q)
        qe.scales = jnp.asarray(s, dtype=jnp.float32)
        qe.biases = jnp.asarray(b, dtype=jnp.float32)
        if lin.bias is not None:
            qe.bias = lin.bias
        return qe

    def to_linear(self) -> Linear:
        q = np.asarray(self.weight)
        if self.packed:
            q = _unpack4(q)
        lin = Linear(q.shape[1], q.shape[0], bias=self.bias is not None)
        lin.weight = jnp.asarray(_affine_dequantize(
            q, np.asarray(self.scales), np.asarray(self.biases),
            self.group_size))
        if self.bias is not None:
            lin.bias = self.bias
        return lin

    def _dequant(self, dtype):
        q = _unpack4(self.weight) if self.packed else self.weight
        return _affine_dequantize(
            q, self.scales.astype(dtype), self.biases.astype(dtype),
            self.group_size,
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        from .pallas_ops import (
            quant_matmul_supported,
            quantized_matmul,
            use_pallas_quant,
        )

        o = self.weight.shape[0]
        i = self.in_features
        n_rows = int(np.prod(x.shape[:-1]))
        # decode-shaped calls only: the kernel keeps all of x resident in
        # VMEM, so big prefill batches (rows*I) take the dense path instead
        if (use_pallas_quant() and n_rows <= 512
                and quant_matmul_supported(o, i, self.group_size,
                                           packed=self.packed)):
            # fused HBM-streaming dequant-matmul: codes are read once as
            # (packed) uint8; the full-precision weight never exists in HBM
            y = quantized_matmul(
                x.reshape(-1, i), self.weight, self.scales, self.biases,
                self.group_size, packed=self.packed,
            ).reshape(*x.shape[:-1], o)
        else:
            w = self._dequant(x.dtype)
            y = x @ w.T
        if self.bias is not None:
            y = y + self.bias.astype(x.dtype)
        return y


class QuantizedEmbedding(Module):
    """Gather + dequant; supports ``as_linear`` for tied LM heads."""

    def __init__(self, num_embeddings: int, dim: int, group_size: int = 64,
                 bits: int = 4):
        self.group_size = group_size
        self.bits = bits
        self.packed = _packable(bits, dim)
        stored = dim // 2 if self.packed else dim
        self.weight = jnp.zeros((num_embeddings, stored), dtype=jnp.uint8)
        self.scales = jnp.ones((num_embeddings, dim // group_size),
                               dtype=jnp.float32)
        self.biases = jnp.zeros((num_embeddings, dim // group_size),
                                dtype=jnp.float32)

    @property
    def dim(self) -> int:
        return self.scales.shape[1] * self.group_size

    @classmethod
    def from_embedding(cls, emb: Embedding, group_size: int = 64,
                       bits: int = 4) -> "QuantizedEmbedding":
        w = np.asarray(emb.weight)
        qe = cls(w.shape[0], w.shape[1], group_size=group_size, bits=bits)
        q, s, b = _affine_quantize(w, group_size, bits)
        qe.weight = jnp.asarray(_pack4(q) if qe.packed else q)
        qe.scales = jnp.asarray(s, dtype=jnp.float32)
        qe.biases = jnp.asarray(b, dtype=jnp.float32)
        return qe

    def to_embedding(self) -> Embedding:
        q = np.asarray(self.weight)
        if self.packed:
            q = _unpack4(q)
        emb = Embedding(q.shape[0], q.shape[1])
        emb.weight = jnp.asarray(_affine_dequantize(
            q, np.asarray(self.scales), np.asarray(self.biases),
            self.group_size))
        return emb

    def _dequant_rows(self, idx: jax.Array, dtype):
        d = self.dim
        q = self.weight[idx]
        if self.packed:
            q = _unpack4(q)
        q = q.reshape(*idx.shape, d // self.group_size,
                      self.group_size).astype(dtype)
        w = q * self.scales[idx].astype(dtype)[..., None] \
            + self.biases[idx].astype(dtype)[..., None]
        return w.reshape(*idx.shape, d)

    def __call__(self, idx: jax.Array) -> jax.Array:
        # dequant in the scales dtype so a bf16-cast quantized model keeps
        # bf16 activations end-to-end
        return self._dequant_rows(idx, self.scales.dtype)

    def as_linear(self, x: jax.Array) -> jax.Array:
        q = _unpack4(self.weight) if self.packed else self.weight
        w = _affine_dequantize(q, self.scales.astype(x.dtype),
                               self.biases.astype(x.dtype), self.group_size)
        return x @ w.T


def _walk_replace(obj, fn: Callable[[str, Module], Optional[Module]],
                  path: str = ""):
    """Recursively replace submodules; fn returns a replacement or None.

    Covers every container the module pytree system treats as dynamic
    (nn/module._is_dynamic): Module attributes, lists, tuples, and dicts —
    a submodule held in any of them must not silently escape quantization."""
    if isinstance(obj, Module):
        for name, value in list(vars(obj).items()):
            sub = f"{path}.{name}" if path else name
            repl = fn(sub, value) if isinstance(value, Module) else None
            if repl is not None:
                setattr(obj, name, repl)
            else:
                replaced = _walk_replace(value, fn, sub)
                if replaced is not value:
                    setattr(obj, name, replaced)
        return obj
    if isinstance(obj, list):
        for i, value in enumerate(obj):
            sub = f"{path}.{i}"
            repl = fn(sub, value) if isinstance(value, Module) else None
            if repl is not None:
                obj[i] = repl
            else:
                replaced = _walk_replace(value, fn, sub)
                if replaced is not value:
                    obj[i] = replaced
        return obj
    if isinstance(obj, tuple):
        new = []
        changed = False
        for i, value in enumerate(obj):
            sub = f"{path}.{i}"
            repl = fn(sub, value) if isinstance(value, Module) else None
            if repl is None:
                repl = _walk_replace(value, fn, sub)
            changed = changed or repl is not value
            new.append(repl)
        return type(obj)(new) if changed else obj
    if isinstance(obj, dict):
        for key, value in list(obj.items()):
            sub = f"{path}.{key}"
            repl = fn(sub, value) if isinstance(value, Module) else None
            if repl is not None:
                obj[key] = repl
            else:
                replaced = _walk_replace(value, fn, sub)
                if replaced is not value:
                    obj[key] = replaced
        return obj
    return obj


def quantize_model(model, group_size: int = 64, bits: int = 4,
                   quant_predicate: Optional[Callable] = None):
    """In-place convert Linear/Embedding -> quantized counterparts.

    ``quant_predicate(path, module, config)`` may return False (skip), True
    (use defaults), or a dict {"group_size": g, "bits": b}.  Models can veto
    via ``model_quant_predicate`` (reference tts/utils.py:349-360).
    """
    model_pred = getattr(model, "model_quant_predicate",
                         lambda p, m, config: True)

    def decide(path, mod):
        if not isinstance(mod, (Linear, Embedding)):
            return None
        in_dim = mod.weight.shape[1]
        if not model_pred(path, mod, None):
            return None
        params = {"group_size": group_size, "bits": bits}
        if quant_predicate is not None:
            verdict = quant_predicate(path, mod, None)
            if verdict is False:
                return None
            if isinstance(verdict, dict):
                params.update(verdict)
        # divisibility is checked against the FINAL group size so a
        # predicate's per-layer override can rescue layers the default
        # group size would skip
        if in_dim % params["group_size"] != 0:
            return None
        if isinstance(mod, Linear):
            return QuantizedLinear.from_linear(mod, **params)
        return QuantizedEmbedding.from_embedding(mod, **params)

    _walk_replace(model, decide)
    return model


def dequantize_model(model):
    """Inverse of :func:`quantize_model` (reference convert --dequantize)."""

    def decide(path, mod):
        if isinstance(mod, QuantizedLinear):
            return mod.to_linear()
        if isinstance(mod, QuantizedEmbedding):
            return mod.to_embedding()
        return None

    _walk_replace(model, decide)
    return model


def mixed_quant_predicate_builder(recipe: str, model) -> Callable:
    """Mixed-bit recipes ``mixed_L_H`` (reference delegates to mlx_lm's
    builder, tts/utils.py:345-346): embeddings and LM heads always get H
    bits; one in four indexed layers gets H bits; the rest get L bits."""
    import re

    low, high = (int(x) for x in recipe.split("_")[1:])

    def predicate(path, mod, config):
        if "embed" in path or "lm_head" in path or path.endswith("head"):
            return {"bits": high}
        m = re.search(r"\.(\d+)\.", path)
        if m is not None and int(m.group(1)) % 4 == 0:
            return {"bits": high}
        return {"bits": low}

    return predicate
