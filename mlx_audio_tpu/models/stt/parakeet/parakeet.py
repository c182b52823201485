"""Parakeet STT (NeMo lineage) — Conformer + {TDT, RNNT, CTC} decoders.

Capability parity with /root/reference/mlx_audio/stt/models/parakeet/
parakeet.py:104-608.  The reference drives its greedy label loops one
Python step at a time; here TDT and RNNT run as jitted `lax.while_loop`s
with fixed output buffers — the host only detokenizes and assembles
aligned sentences.  Long audio chunking + token-merge (alignment.py)
remains host logic.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from functools import partial
from pathlib import Path
from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.models.stt.parakeet import alignment as al
from mlx_audio_tpu.models.stt.parakeet.audio import (
    PreprocessArgs,
    log_mel_spectrogram,
)
from mlx_audio_tpu.models.stt.parakeet.conformer import Conformer, ConformerArgs
from mlx_audio_tpu.models.stt.parakeet.ctc import (
    AuxCTCArgs,
    ConvASRDecoder,
    ConvASRDecoderArgs,
)
from mlx_audio_tpu.models.stt.parakeet.rnnt import (
    JointArgs,
    JointNetwork,
    JointNetworkArgs,
    PredictArgs,
    PredictNetwork,
    PredictNetworkArgs,
)
from mlx_audio_tpu.nn import Module


def _sub(cls, d):
    return cls(**{k: v for k, v in d.items() if k in cls.__dataclass_fields__})


def _predict_args(d: dict) -> PredictArgs:
    return PredictArgs(
        blank_as_pad=d.get("blank_as_pad", True),
        vocab_size=d["vocab_size"],
        prednet=_sub(PredictNetworkArgs, d["prednet"]),
    )


def _joint_args(d: dict) -> JointArgs:
    return JointArgs(
        num_classes=d["num_classes"],
        vocabulary=d["vocabulary"],
        jointnet=_sub(JointNetworkArgs, d["jointnet"]),
        num_extra_outputs=d.get("num_extra_outputs", 0),
    )


# ---------------------------------------------------------------------------
# Jitted greedy loops
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("vocab_size", "max_symbols", "max_out",
                                   "tdt"))
def _transducer_greedy_loop(model, features, max_length, durations,
                            vocab_size: int, max_symbols: int, max_out: int,
                            tdt: bool):
    """Greedy TDT/RNNT label loop as ONE batched lax.while_loop.

    features: [B, T, D]; max_length: [B]; durations: [n_dur] (TDT) or
    unused.  All rows step in lockstep with their OWN time cursor and
    prediction state; finished rows freeze.  This is what makes chunked
    long audio fast: the per-label step is latency-bound (one tiny LSTM +
    joint matvec), so B chunks in one loop cost the same wall time as one
    (round-3 fix — the loop used to run per chunk sequentially).
    Returns (tokens [B, max_out], times, durs, counts [B]).
    """
    b = features.shape[0]
    h0, c0 = model.decoder.init_state(b)
    blank = vocab_size

    def cond(s):
        time, count = s[0], s[8]
        return jnp.any((time < max_length) & (count < max_out))

    def body(s):
        (time, last_tok, use_emb, h, c, toks, times, durs, count, new_syms) = s
        active = (time < max_length) & (count < max_out)          # [B]
        t_idx = jnp.clip(time, 0, features.shape[1] - 1)
        feature = jnp.take_along_axis(
            features, t_idx[:, None, None], axis=1)[:, 0]         # [B, D]
        dec_out, (h2, c2) = model.decoder.step(last_tok, (h, c), use_emb)
        joint = model.joint(feature, dec_out).astype(jnp.float32)  # [B, C]
        pred = jnp.argmax(joint[:, : vocab_size + 1], axis=-1).astype(jnp.int32)
        if tdt:
            decision = jnp.argmax(joint[:, vocab_size + 1:],
                                  axis=-1).astype(jnp.int32)
            dur = durations[decision]
        else:
            dur = jnp.where(pred == blank, 1, 0).astype(jnp.int32)
        emit = (pred != blank) & active

        # B-element scatters, not full [B, max_out] where-rewrites (the
        # emission buffers are ~MB-scale; rewriting them every label step
        # dominated the loop body)
        rows = jnp.arange(b)
        slot = jnp.minimum(count, max_out - 1)
        toks = toks.at[rows, slot].set(
            jnp.where(emit, pred, toks[rows, slot]))
        times = times.at[rows, slot].set(
            jnp.where(emit, time, times[rows, slot]))
        durs = durs.at[rows, slot].set(
            jnp.where(emit, jnp.where(tdt, dur, 1), durs[rows, slot]))
        count = count + emit.astype(jnp.int32)
        last_tok = jnp.where(emit, pred, last_tok)
        use_emb = use_emb | emit
        gate = emit[None, :, None]
        h = jnp.where(gate, h2, h)
        c = jnp.where(gate, c2, c)

        dur = jnp.where(active, dur, 0)
        time = time + dur
        if tdt:
            new_syms = jnp.where(dur != 0, 0,
                                 new_syms + active.astype(jnp.int32))
            bump = active & (max_symbols > 0) & (new_syms >= max_symbols)
            time = time + bump.astype(jnp.int32)
            new_syms = jnp.where(bump, 0, new_syms)
        else:
            new_syms = jnp.where(emit, new_syms + 1,
                                 jnp.where(active, 0, new_syms))
            bump = emit & (max_symbols > 0) & (new_syms >= max_symbols)
            time = time + bump.astype(jnp.int32)
            new_syms = jnp.where(bump, 0, new_syms)
        return (time, last_tok, use_emb, h, c, toks, times, durs, count, new_syms)

    init = (
        jnp.zeros((b,), jnp.int32),
        jnp.full((b,), blank, jnp.int32),
        jnp.zeros((b,), bool),
        h0, c0,
        jnp.zeros((b, max_out), jnp.int32),
        jnp.zeros((b, max_out), jnp.int32),
        jnp.zeros((b, max_out), jnp.int32),
        jnp.zeros((b,), jnp.int32),
        jnp.zeros((b,), jnp.int32),
    )
    out = jax.lax.while_loop(cond, body, init)
    return out[5], out[6], out[7], out[8]


@jax.jit
def _encode_jit(model, mel):
    return model.encoder(mel)


@jax.jit
def _ctc_logits_jit(model, mel):
    feats, lengths = model.encoder(mel)
    return model.decoder(feats), lengths


# ---------------------------------------------------------------------------


class BaseParakeet(Module):
    """Shared transcription driver (chunking + merge, parakeet.py:129-225)."""

    def decode(self, mel: jax.Array):
        raise NotImplementedError

    def decode_chunk(self, audio_data, verbose=False) -> al.AlignedResult:
        mel = log_mel_spectrogram(audio_data, self.preprocessor_config)
        result = self.decode(mel)[0]
        if verbose:
            print(result.text)
        return result

    def generate(self, path, *, chunk_duration: Optional[float] = None,
                 overlap_duration: float = 15.0,
                 chunk_callback: Optional[Callable] = None,
                 **kwargs) -> al.AlignedResult:
        kwargs.pop("max_tokens", None)
        verbose = kwargs.pop("verbose", False)
        if isinstance(path, (str, Path)):
            from mlx_audio_tpu.utils.audio_io import load_audio

            audio_data = load_audio(path, self.preprocessor_config.sample_rate)
        else:
            audio_data = np.asarray(path)

        if chunk_duration is None:
            return self.decode_chunk(audio_data, verbose)
        sr = self.preprocessor_config.sample_rate
        if len(audio_data) / sr <= chunk_duration:
            return self.decode_chunk(audio_data, verbose)

        if chunk_duration <= overlap_duration:
            raise ValueError(
                f"chunk_duration ({chunk_duration}s) must exceed "
                f"overlap_duration ({overlap_duration}s)"
            )
        chunk_samples = int(chunk_duration * sr)
        overlap_samples = int(overlap_duration * sr)

        # Long audio is embarrassingly parallel across chunks (SURVEY.md
        # §2.5): run every full-length chunk through ONE batched encoder
        # pass; only the shorter tail chunk decodes alone.  Host-side token
        # merging below is unchanged.
        starts = list(range(0, len(audio_data),
                            chunk_samples - overlap_samples))
        full = [s for s in starts if s + chunk_samples <= len(audio_data)]
        batch_results = {}
        if len(full) > 1:
            mels = jnp.concatenate([
                log_mel_spectrogram(
                    audio_data[s: s + chunk_samples], self.preprocessor_config
                )
                for s in full
            ], axis=0)  # log_mel returns [1, frames, features]
            # chunks are embarrassingly parallel -> shard the chunk batch
            # over the 'data' mesh axis when a mesh is active (--mesh dp=N)
            from mlx_audio_tpu.parallel.context import active_mesh

            ctx = active_mesh()
            if ctx is not None and ctx.dp > 1:
                mels, n = ctx.pad_batch(mels)
                model = ctx.place_replicated(self)
                with ctx.mesh:
                    results = model.decode(ctx.shard_batch(mels))[:n]
            else:
                results = self.decode(mels)
            for s, res in zip(full, results):
                batch_results[s] = res

        all_tokens = []
        for start in starts:
            end = min(start + chunk_samples, len(audio_data))
            if chunk_callback is not None:
                chunk_callback(end, len(audio_data))
            chunk_result = batch_results.get(start)
            if chunk_result is None:
                chunk_result = self.decode_chunk(audio_data[start:end])
            offset = start / sr
            chunk_tokens = []
            for sentence in chunk_result.sentences:
                for token in sentence.tokens:
                    token.start += offset
                    token.end = token.start + token.duration
                chunk_tokens.extend(sentence.tokens)
            if all_tokens:
                try:
                    all_tokens = al.merge_longest_contiguous(
                        all_tokens, chunk_tokens, overlap_duration=overlap_duration
                    )
                except RuntimeError:
                    all_tokens = al.merge_longest_common_subsequence(
                        all_tokens, chunk_tokens, overlap_duration=overlap_duration
                    )
            else:
                all_tokens = chunk_tokens
        return al.sentences_to_result(al.tokens_to_sentences(all_tokens))

    def _time_scale(self) -> float:
        return (self.encoder_config.subsampling_factor
                / self.preprocessor_config.sample_rate
                * self.preprocessor_config.hop_length)

    @classmethod
    def from_config(cls, config: dict):
        if config.get("model_type") == "parakeet_ctc" or (
            "encoder_config" in config and "preprocessor" not in config
        ):
            return cls._from_hf_config(config)
        target = config.get("target", "")
        has_tdt = config.get("model_defaults", {}).get("tdt_durations") is not None
        pre = PreprocessArgs.from_dict(config["preprocessor"])
        enc = ConformerArgs.from_dict(config["encoder"])
        if "rnnt" in target and has_tdt and "hybrid" not in target:
            return ParakeetTDT(pre, enc, _predict_args(config["decoder"]),
                               _joint_args(config["joint"]),
                               config["decoding"])
        if "hybrid" in target and has_tdt:
            m = ParakeetTDT(pre, enc, _predict_args(config["decoder"]),
                            _joint_args(config["joint"]), config["decoding"])
            m.ctc_decoder = ConvASRDecoder(
                _sub(ConvASRDecoderArgs, config["aux_ctc"]["decoder"])
            )
            return m
        if "rnnt" in target:
            return ParakeetRNNT(pre, enc, _predict_args(config["decoder"]),
                                _joint_args(config["joint"]),
                                config["decoding"])
        if "ctc" in target:
            return ParakeetCTC(pre, enc,
                               _sub(ConvASRDecoderArgs, config["decoder"]))
        raise ValueError("Model is not supported yet!")

    @classmethod
    def _from_hf_config(cls, config: dict) -> "ParakeetCTC":
        """Build from an HF-transformers ParakeetCTCConfig dict (the layout
        nvidia/parakeet-* HF checkpoints ship in); weights route through
        sanitize_hf_parakeet via `sanitize`."""
        enc = config.get("encoder_config", {}) or {}
        pre = PreprocessArgs(
            sample_rate=16000, normalize="per_feature",
            window_size=0.025, window_stride=0.01, window="hann",
            features=enc.get("num_mel_bins", 80), n_fft=512,
        )
        conf = ConformerArgs(
            feat_in=enc.get("num_mel_bins", 80),
            n_layers=enc.get("num_hidden_layers", 24),
            d_model=enc.get("hidden_size", 1024),
            n_heads=enc.get("num_attention_heads", 8),
            ff_expansion_factor=(enc.get("intermediate_size", 4096)
                                 // enc.get("hidden_size", 1024)),
            subsampling_factor=enc.get("subsampling_factor", 8),
            self_attention_model="rel_pos", subsampling="dw_striding",
            conv_kernel_size=enc.get("conv_kernel_size", 9),
            subsampling_conv_channels=enc.get("subsampling_conv_channels", 256),
            pos_emb_max_len=enc.get("max_position_embeddings", 5000),
        )
        # vocabulary comes from the checkpoint's tokenizer.json/vocab.json
        # when available; fall back to index placeholders (ids still decode,
        # text is then token indices)
        vocab = (config.get("vocabulary")
                 or _vocab_from_checkpoint_dir(config.get("tokenizer_name")))
        if vocab:
            # CTC classes = vocab + blank; trim any trailing blank/pad entry
            # the tokenizer file may carry
            vocab = list(vocab)[: config.get("vocab_size", len(vocab) + 1) - 1]
        else:
            import warnings

            warnings.warn("no tokenizer.json/vocab.json found next to the "
                          "checkpoint; transcripts will be token indices")
            vocab = [str(i) for i in range(config.get("vocab_size", 1025) - 1)]
        dec = ConvASRDecoderArgs(feat_in=conf.d_model, num_classes=-1,
                                 vocabulary=vocab)
        return ParakeetCTC(pre, conf, dec)

    def sanitize(self, weights: dict) -> dict:
        if any(k.startswith("encoder.subsampling.") or k.startswith("ctc_head.")
               for k in weights):
            return sanitize_hf_parakeet(weights)
        return weights


class ParakeetTDT(BaseParakeet):
    def __init__(self, preprocess_args, encoder_args, decoder_args, joint_args,
                 decoding: dict, tdt: bool = True):
        self.preprocessor_config = preprocess_args
        self.encoder_config = encoder_args
        self.vocabulary = joint_args.vocabulary
        self.durations = decoding.get("durations", [0, 1, 2, 3, 4]) if tdt else [1]
        greedy = decoding.get("greedy") or {}
        self.max_symbols = greedy.get("max_symbols") or 10
        self.is_tdt = tdt
        self.encoder = Conformer(encoder_args)
        self.decoder = PredictNetwork(decoder_args)
        self.joint = JointNetwork(joint_args)

    def decode(self, mel: jax.Array):
        if mel.ndim == 2:
            mel = mel[None]
        features, lengths = _encode_jit(self, jnp.asarray(mel))
        scale = self._time_scale()
        lengths_np = np.asarray(lengths)
        # worst case: max_symbols emissions per frame before the forced
        # time advance (reference parakeet.py:384-386,477-480) — a smaller
        # buffer would silently truncate the transcript.  One buffer size
        # for the whole batch (one compile per bucket).
        max_out = max(16, (int(self.max_symbols) + 1) * int(lengths_np.max()))
        toks, times, durs, counts = _transducer_greedy_loop(
            self, features, jnp.asarray(lengths_np.astype(np.int32)),
            jnp.asarray(self.durations, jnp.int32),
            vocab_size=len(self.vocabulary),
            max_symbols=int(self.max_symbols), max_out=max_out,
            tdt=self.is_tdt,
        )
        toks_np = np.asarray(toks)       # one transfer each, not per token
        times_np = np.asarray(times)
        durs_np = np.asarray(durs)
        counts_np = np.asarray(counts)
        results = []
        for b in range(features.shape[0]):
            hypothesis = [
                al.AlignedToken(
                    int(toks_np[b, i]),
                    start=float(times_np[b, i]) * scale,
                    duration=float(durs_np[b, i]) * scale,
                    text=al.decode_tokens([int(toks_np[b, i])],
                                          self.vocabulary),
                )
                for i in range(int(counts_np[b]))
            ]
            results.append(
                al.sentences_to_result(al.tokens_to_sentences(hypothesis)))
        return results


class ParakeetRNNT(ParakeetTDT):
    def __init__(self, preprocess_args, encoder_args, decoder_args, joint_args,
                 decoding: dict):
        super().__init__(preprocess_args, encoder_args, decoder_args,
                         joint_args, decoding, tdt=False)


class ParakeetCTC(BaseParakeet):
    def __init__(self, preprocess_args, encoder_args, decoder_args):
        self.preprocessor_config = preprocess_args
        self.encoder_config = encoder_args
        self.vocabulary = decoder_args.vocabulary
        self.encoder = Conformer(encoder_args)
        self.decoder = ConvASRDecoder(decoder_args)

    def decode(self, mel: jax.Array):
        if mel.ndim == 2:
            mel = mel[None]
        logits, lengths = _ctc_logits_jit(self, jnp.asarray(mel))
        logits_np = np.asarray(logits)
        scale = self._time_scale()
        blank = len(self.vocabulary)
        results = []
        for b in range(logits_np.shape[0]):
            n = int(lengths[b])
            best = logits_np[b, :n].argmax(axis=-1)
            # NeMo CTC collapse: emit on label change vs the PREVIOUS
            # FRAME (blank included), so a token repeated across a blank
            # frame is emitted twice.  (The reference never resets prev on
            # blank and silently drops such repeats.)
            emitted = []  # (token, start_frame)
            prev_frame = blank
            for t, tok in enumerate(best):
                tok = int(tok)
                if tok != blank and tok != prev_frame:
                    emitted.append((tok, t))
                prev_frame = tok
            last_non_blank = next(
                (t for t in range(n - 1, -1, -1) if int(best[t]) != blank),
                n - 1,
            )
            hypothesis = []
            for i, (tok, t0) in enumerate(emitted):
                end = (emitted[i + 1][1] if i + 1 < len(emitted)
                       else last_non_blank + 1)
                hypothesis.append(al.AlignedToken(
                    tok, start=t0 * scale, duration=(end - t0) * scale,
                    text=al.decode_tokens([tok], self.vocabulary),
                ))
            results.append(al.sentences_to_result(al.tokens_to_sentences(hypothesis)))
        return results


def sanitize_hf_parakeet(weights: dict) -> dict:
    """HF-transformers Parakeet state dict (modeling_parakeet.py, the
    format nvidia/parakeet-* HF checkpoints ship in) -> our NeMo-style
    layout (ParakeetCTC pytree keys).

    Subsampling Sequential indices: HF interleaves ReLU modules (conv at 0,
    then dw/pw at 3k-1/3k per extra stage); ours keeps a conv-only list
    (dw/pw at 2k-1/2k).  Conv weights go torch [O, I/g, ...] -> K-major
    ([K, I/g, O] for 1-D, HWIO for 2-D).
    """
    import re

    out = {}
    for k, v in weights.items():
        v = np.asarray(v)
        if k.endswith("num_batches_tracked"):
            continue
        if k.startswith("ctc_head."):
            if k.endswith("weight"):
                out["decoder.decoder_layers.0.weight"] = v.transpose(2, 1, 0)
            else:
                out["decoder.decoder_layers.0.bias"] = v
            continue
        m = re.match(r"encoder\.subsampling\.layers\.(\d+)\.(weight|bias)", k)
        if m:
            j, leaf = int(m.group(1)), m.group(2)
            if j == 0:
                idx = 0
            elif j % 3 == 2:  # depthwise conv of stage k=(j+1)/3
                idx = 2 * ((j + 1) // 3) - 1
            else:  # pointwise conv of stage k=j/3
                idx = 2 * (j // 3)
            if leaf == "weight":
                v = v.transpose(2, 3, 1, 0)  # [O, I/g, kh, kw] -> HWIO
            out[f"encoder.pre_encode.conv.{idx}.{leaf}"] = v
            continue
        k = k.replace("encoder.subsampling.linear.", "encoder.pre_encode.out.")
        k = (k.replace(".self_attn.q_proj.", ".self_attn.linear_q.")
             .replace(".self_attn.k_proj.", ".self_attn.linear_k.")
             .replace(".self_attn.v_proj.", ".self_attn.linear_v.")
             .replace(".self_attn.o_proj.", ".self_attn.linear_out.")
             .replace(".self_attn.relative_k_proj.", ".self_attn.linear_pos.")
             .replace(".self_attn.bias_u", ".self_attn.pos_bias_u")
             .replace(".self_attn.bias_v", ".self_attn.pos_bias_v")
             .replace(".conv.norm.", ".conv.batch_norm."))
        if ".conv." in k and v.ndim == 3:
            v = v.transpose(2, 1, 0)  # torch [O, I/g, K] -> [K, I/g, O]
        out[k] = v
    return out


def _vocab_from_checkpoint_dir(d) -> Optional[list]:
    """id -> token list from an HF tokenizer.json (BPE/WordLevel dict or
    Unigram [token, score] list) or a vocab.json next to the checkpoint."""
    if not d:
        return None
    tj = Path(d) / "tokenizer.json"
    if tj.exists():
        with open(tj) as f:
            vocab = json.load(f).get("model", {}).get("vocab")
        if isinstance(vocab, dict):
            inv = [""] * (max(vocab.values()) + 1)
            for t, i in vocab.items():
                inv[i] = t
            return inv
        if isinstance(vocab, list):
            return [t for t, _score in vocab]
    vj = Path(d) / "vocab.json"
    if vj.exists():
        with open(vj) as f:
            v = json.load(f)
        inv = [""] * (max(v.values()) + 1)
        for t, i in v.items():
            inv[i] = t
        return inv
    return None


class Model:
    """Registry entry point: dispatches on the NeMo config target."""

    def __new__(cls, config: Union[dict]):
        return BaseParakeet.from_config(config)
