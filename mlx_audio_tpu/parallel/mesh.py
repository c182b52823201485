"""Distribution layer: device meshes + sharding rules (SURVEY.md §2.5).

The reference is single-device by construction; this layer is the TPU-native
addition: utterance batches data-parallel over a ('data', 'model') mesh, and
tensor-parallel rules for Llama-class backbones (CSM-1B) when a model
exceeds one chip.  Collectives are inserted by XLA from the shardings —
all-reduce/all-gather ride ICI inside a host, DCN across hosts
(`jax.distributed.initialize` for multi-host).
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mlx_audio_tpu.nn.module import map_arrays


def get_mesh(
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
    axis_names: tuple = ("data", "model"),
) -> Mesh:
    """('data', 'model') mesh over the available devices.

    `model_parallel` is the TP degree; remaining devices form the DP axis.
    On multi-host slices the TP axis should be the innermost (ICI-adjacent)
    axis, which this layout guarantees.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    return Mesh(devices.reshape(n // model_parallel, model_parallel), axis_names)


def replicate(mesh: Mesh, tree):
    """Place every leaf replicated on the mesh."""
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Shard the leading (batch) axis of every array leaf."""
    s = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


# ---------------------------------------------------------------------------
# Tensor-parallel rules
# ---------------------------------------------------------------------------

# Llama-family column/row parallel split: q/k/v/gate/up shard the output dim
# (Linear weight is [out, in] -> P('model', None)); o/down shard the input
# dim (P(None, 'model')); embeddings shard the vocab dim; norms replicate.
_TP_COL = re.compile(r"\.(q_proj|k_proj|v_proj|gate_proj|up_proj)\.weight$")
_TP_ROW = re.compile(r"\.(o_proj|down_proj)\.weight$")
_TP_EMBED = re.compile(r"(embed_tokens|text_embeddings|audio_embeddings)\.weight$")


def tp_rules_llama(path: str, x) -> P:
    """PartitionSpec for a Llama-model leaf under ('data', 'model')."""
    if x.ndim == 2:
        if _TP_COL.search(path):
            return P("model", None)
        if _TP_ROW.search(path):
            return P(None, "model")
        if _TP_EMBED.search(path):
            return P("model", None)
    return P()


# Dia's projections are DenseGeneral tensors (weight = in_shapes +
# out_features, models/tts/dia/layers.py): q/k/v [E, heads, H] shard the
# head axis, o [heads, H, E] shards its head input axis, the fused gate MLP
# [E, 2, F] and wo [F, E] split the hidden dim, and the per-channel logits
# head [E, C, V] splits the vocab.  Head-parallel attention + column/row-
# parallel MLP is the same recipe as tp_rules_llama, expressed on Dia's
# tensor layouts (reference contract: dia/layers.py DenseGeneral; the
# reference itself is single-device, SURVEY.md §2.5).
_DIA_QKV = re.compile(r"\.(q_proj|k_proj|v_proj)\.weight$")
_DIA_O = re.compile(r"\.o_proj\.weight$")
_DIA_WI = re.compile(r"\.wi_fused\.weight$")
_DIA_WO = re.compile(r"\.wo\.weight$")
_DIA_LOGITS = re.compile(r"logits_dense\.weight$")


def tp_rules_dia(path: str, x) -> P:
    """PartitionSpec for a Dia encoder-decoder leaf under ('data', 'model')."""
    if x.ndim == 3:
        if _DIA_QKV.search(path):
            return P(None, "model", None)
        if _DIA_O.search(path):
            return P("model", None, None)
        if _DIA_WI.search(path):
            return P(None, None, "model")
        if _DIA_LOGITS.search(path):
            return P(None, None, "model")
    if x.ndim == 2 and _DIA_WO.search(path):
        return P("model", None)
    return P()


def shard_module(mesh: Mesh, module, rules: Callable[[str, object], P]):
    """Apply per-leaf PartitionSpec rules; leaves whose dims don't divide the
    mesh axis fall back to replication."""

    def place(path, x):
        spec = rules(path, x)
        # verify divisibility; fall back to replicated
        for dim, axis in zip(x.shape, spec):
            if axis is None:
                continue
            size = mesh.shape[axis] if isinstance(axis, str) else int(
                np.prod([mesh.shape[a] for a in axis])
            )
            if dim % size != 0:
                spec = P()
                break
        return jax.device_put(x, NamedSharding(mesh, spec))

    return map_arrays(module, place)


# ---------------------------------------------------------------------------
# Data-parallel map (SURVEY.md §2.5(e): long-audio STT chunks and bulk TTS
# batches are embarrassingly parallel over the mesh)
# ---------------------------------------------------------------------------


def pmap_batches(mesh: Mesh, fn: Callable, model, *arrays, axis: str = "data"):
    """Run ``fn(model, *batch)`` with the leading axis of every array sharded
    over ``axis`` and the model replicated.  The batch size must divide the
    axis size; callers bucket/pad first (all our model drivers already do).

    XLA inserts no collectives for elementwise-per-example programs — each
    device computes its shard locally; results come back sharded and can be
    gathered on host with `np.asarray`.
    """
    n = mesh.shape[axis]
    for a in arrays:
        if a.shape[0] % n != 0:
            raise ValueError(
                f"batch {a.shape[0]} not divisible by mesh axis '{axis}'={n}")
    model = replicate(mesh, model)
    arrays = tuple(shard_batch(mesh, a, axis) for a in arrays)
    out_sharding = NamedSharding(mesh, P(axis))

    jitted = _pmap_jit(fn, out_sharding)
    with mesh:
        return jitted(model, *arrays)


@lru_cache(maxsize=64)
def _pmap_jit(fn: Callable, out_sharding):
    """Cache the jit wrapper per (fn, sharding): a fresh jax.jit(fn) each
    call would retrace + recompile on every pmap_batches invocation."""
    return jax.jit(fn, out_shardings=out_sharding)
