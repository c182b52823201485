"""Parakeet RNNT/TDT prediction + joint networks (reference rnnt.py:88-156).

The prediction network is a stacked unidirectional LSTM with torch-layout
weights; its single-step form is jit-friendly for the `lax.while_loop`
greedy decoders.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from mlx_audio_tpu.nn import Embedding, Linear, Module
from mlx_audio_tpu.nn.layers import _uniform


@dataclass
class PredictNetworkArgs:
    pred_hidden: int
    pred_rnn_layers: int
    rnn_hidden_size: Optional[int] = None


@dataclass
class JointNetworkArgs:
    joint_hidden: int
    activation: str
    encoder_hidden: int
    pred_hidden: int


@dataclass
class PredictArgs:
    blank_as_pad: bool
    vocab_size: int
    prednet: PredictNetworkArgs


@dataclass
class JointArgs:
    num_classes: int
    vocabulary: List[str]
    jointnet: JointNetworkArgs
    num_extra_outputs: int = 0


class LSTMLayer(Module):
    """Single unidirectional LSTM layer (torch gate order i,f,g,o)."""

    def __init__(self, input_size: int, hidden_size: int):
        scale = 1.0 / math.sqrt(hidden_size)
        self.Wx = _uniform((4 * hidden_size, input_size), scale)
        self.Wh = _uniform((4 * hidden_size, hidden_size), scale)
        self.bias = _uniform((4 * hidden_size,), scale)

    def step(self, x: jax.Array, h: jax.Array, c: jax.Array):
        """x [B, D], h/c [B, H] -> (h', c')."""
        ifgo = x @ self.Wx.T + h @ self.Wh.T + self.bias
        i, f, g, o = jnp.split(ifgo, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return h, c


class PredictNetwork(Module):
    """Embedding + stacked LSTM (reference rnnt.py:88-117); single-step."""

    def __init__(self, args: PredictArgs):
        self.pred_hidden = args.prednet.pred_hidden
        self.num_layers = args.prednet.pred_rnn_layers
        hidden = args.prednet.rnn_hidden_size or args.prednet.pred_hidden
        self.hidden_size = hidden
        vocab = args.vocab_size + (1 if args.blank_as_pad else 0)
        self.embed = Embedding(vocab, args.prednet.pred_hidden)
        self.lstm = [
            LSTMLayer(args.prednet.pred_hidden if i == 0 else hidden, hidden)
            for i in range(self.num_layers)
        ]

    def init_state(self, batch: int = 1, dtype=jnp.float32):
        h = jnp.zeros((self.num_layers, batch, self.hidden_size), dtype)
        c = jnp.zeros((self.num_layers, batch, self.hidden_size), dtype)
        return h, c

    def step(self, token: jax.Array, state, use_embedding: jax.Array):
        """One prediction step.

        token: [B] int32; use_embedding: [B] bool — False feeds the zero
        vector (the reference's blank-start convention, rnnt.py:108-115).
        Returns (output [B, H], new_state).
        """
        h, c = state
        x = jnp.where(use_embedding[:, None], self.embed(token),
                      jnp.zeros((token.shape[0], self.pred_hidden)))
        new_h, new_c = [], []
        out = x
        for i, layer in enumerate(self.lstm):
            hi, ci = layer.step(out, h[i], c[i])
            out = hi
            new_h.append(hi)
            new_c.append(ci)
        return out, (jnp.stack(new_h), jnp.stack(new_c))


class JointNetwork(Module):
    def __init__(self, args: JointArgs):
        self.num_classes = args.num_classes + 1 + args.num_extra_outputs
        self.activation = args.jointnet.activation.lower()
        self.pred = Linear(args.jointnet.pred_hidden, args.jointnet.joint_hidden)
        self.enc = Linear(args.jointnet.encoder_hidden, args.jointnet.joint_hidden)
        self.joint = Linear(args.jointnet.joint_hidden, self.num_classes)

    def __call__(self, enc: jax.Array, pred: jax.Array) -> jax.Array:
        """enc [B, D_enc], pred [B, D_pred] -> logits [B, classes]."""
        x = self.enc(enc) + self.pred(pred)
        if self.activation == "relu":
            x = jax.nn.relu(x)
        elif self.activation == "sigmoid":
            x = jax.nn.sigmoid(x)
        else:
            x = jnp.tanh(x)
        return self.joint(x)
