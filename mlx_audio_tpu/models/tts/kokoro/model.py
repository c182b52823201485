"""Kokoro-82M — non-autoregressive TTS (StyleTTS2 lineage), TPU-first.

Re-creates /root/reference/mlx_audio/tts/models/kokoro/kokoro.py:66-346 with
an XLA-native execution plan:

* **Stage A (duration)** — one jitted graph per phoneme bucket: PLBERT ->
  prosody text encoder -> BiLSTM -> duration head.  Emits the duration-
  context features and integer per-phoneme durations.
* **Stage B (synthesis)** — one jitted graph per (phoneme, frame) bucket:
  the alignment matrix is built *inside* the graph as a vectorized
  cumsum-compare (the reference loops on host, kokoro.py:151-156), then
  F0/N prediction, text encoding, and the ISTFTNet decoder produce audio.
  All stages are batched and mask-exact under bucket padding.

The only host sync between stages is the duration read-out needed to choose
the frame bucket (and for timestamps — same data the reference pulls).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.models.base import (
    BaseModelArgs,
    GenerationResult,
    check_array_shape,
    make_generation_result,
)
from mlx_audio_tpu.models.tts.kokoro.albert import AlbertModelArgs, CustomAlbert
from mlx_audio_tpu.models.tts.kokoro.istftnet import Decoder
from mlx_audio_tpu.models.tts.kokoro.modules import ProsodyPredictor, TextEncoder
from mlx_audio_tpu.nn import Linear, Module


@dataclass
class ModelConfig(BaseModelArgs):
    istftnet: dict
    dim_in: int
    dropout: float
    hidden_dim: int
    max_conv_dim: int
    max_dur: int
    multispeaker: bool
    n_layer: int
    n_mels: int
    n_token: int
    style_dim: int
    text_encoder_kernel_size: int
    plbert: dict
    vocab: Dict[str, int]
    sample_rate: int = 24000


PHONEME_BUCKETS = (16, 32, 64, 128, 256, 512)
FRAME_BUCKET_STEP = 100


def pick_phoneme_bucket(n: int) -> int:
    for b in PHONEME_BUCKETS:
        if n <= b:
            return b
    raise ValueError(f"phoneme sequence too long: {n}")


def pick_frame_bucket(total: int) -> int:
    return max(FRAME_BUCKET_STEP, -(-total // FRAME_BUCKET_STEP) * FRAME_BUCKET_STEP)


def _duration_body(model, input_ids, lengths, style, speed):
    """input_ids [B, N], lengths [B], style [B, 128] (prosody half),
    speed [B] -> (d [B, N, C+S], pred_dur int32 [B, N])."""
    n = input_ids.shape[1]
    pad_mask = jnp.arange(n)[None, :] >= lengths[:, None]
    attn = (~pad_mask).astype(jnp.int32)
    bert_out, _ = model.bert(input_ids, attention_mask=attn)
    d_en = model.bert_encoder(bert_out)  # [B, N, hidden]
    d = model.predictor.text_encoder(d_en, style, lengths, pad_mask)
    dur_logits = model.predictor.predict_durations(d, lengths)
    duration = jax.nn.sigmoid(dur_logits).sum(axis=-1) / speed[:, None]
    pred_dur = jnp.clip(jnp.round(duration), 1, None).astype(jnp.int32)
    pred_dur = jnp.where(pad_mask, 0, pred_dur)
    return d, pred_dur


_duration_stage = jax.jit(_duration_body)


def _synthesis_body(model, input_ids, lengths, d, pred_dur, ref_s, key,
                    num_frames):
    """Frame-bucketed synthesis.  num_frames: [F] zeros array fixing the
    frame bucket shape.  Returns (audio [B, 600*F], total_frames [B])."""
    n = input_ids.shape[1]
    f = num_frames.shape[0]
    pad_mask = jnp.arange(n)[None, :] >= lengths[:, None]

    style_p = ref_s[:, 128:]
    style_d = ref_s[:, :128]

    cum = jnp.cumsum(pred_dur, axis=-1)            # [B, N]
    start = cum - pred_dur
    t_idx = jnp.arange(f)[None, None, :]
    aln = (
        (t_idx >= start[..., None]) & (t_idx < cum[..., None])
    ).astype(d.dtype)                               # [B, N, F]
    total = jnp.minimum(cum[:, -1], f)              # [B]

    en = jnp.einsum("bnc,bnf->bfc", d, aln)
    f0_pred, n_pred = model.predictor.F0Ntrain(en, style_p, frame_lengths=total)

    t_en = model.text_encoder(input_ids, lengths, pad_mask)
    asr = jnp.einsum("bnc,bnf->bfc", t_en, aln)

    audio = model.decoder(asr, f0_pred, n_pred, style_d, key,
                          frame_lengths=total)
    return audio, total


_synthesis_stage = jax.jit(_synthesis_body)


def _synthesis_graph_body(model, input_ids, lengths, ref_s, speed, key,
                          num_frames):
    """Single fused graph: durations + synthesis with a fixed frame bucket
    (no host sync — durations beyond the bucket are truncated).  Used by the
    driver entry point and for whole-pipeline sharding."""
    d, pred_dur = _duration_body(model, input_ids, lengths, ref_s[:, 128:], speed)
    return _synthesis_body(
        model, input_ids, lengths, d, pred_dur, ref_s, key, num_frames
    )


class Model(Module):
    """Kokoro model graph (language-blind; text processing lives in
    pipeline.py, mirroring the reference split)."""

    SAMPLES_PER_FRAME = 600  # 24 kHz / (2x upsample * 10 * 6 * 5) contract

    def __init__(self, config: ModelConfig):
        self.config = config
        self.vocab = config.vocab
        self.bert = CustomAlbert(
            AlbertModelArgs.from_dict({"vocab_size": config.n_token, **config.plbert})
        )
        self.bert_encoder = Linear(self.bert.config.hidden_size, config.hidden_dim)
        self.context_length = self.bert.config.max_position_embeddings
        self.predictor = ProsodyPredictor(
            style_dim=config.style_dim,
            d_hid=config.hidden_dim,
            nlayers=config.n_layer,
            max_dur=config.max_dur,
            dropout=config.dropout,
        )
        self.text_encoder = TextEncoder(
            channels=config.hidden_dim,
            kernel_size=config.text_encoder_kernel_size,
            depth=config.n_layer,
            n_symbols=config.n_token,
        )
        self.decoder = Decoder(
            dim_in=config.hidden_dim,
            style_dim=config.style_dim,
            dim_out=config.n_mels,
            **config.istftnet,
        )

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    # -- synthesis ---------------------------------------------------------

    def phonemes_to_ids(self, phonemes: str) -> list[int]:
        return [self.vocab[p] for p in phonemes if p in self.vocab]

    def synthesize(
        self,
        phonemes: str,
        ref_s: np.ndarray,
        speed: float = 1.0,
        key: Optional[jax.Array] = None,
    ):
        """phonemes -> (audio np.float32 [T], pred_dur np.int32 [n]).

        Mirrors the reference Model.__call__ contract (kokoro.py:120-170).
        """
        ids = self.phonemes_to_ids(phonemes)
        assert len(ids) + 2 <= self.context_length, (len(ids) + 2, self.context_length)
        tokens = [0, *ids, 0]
        n_valid = len(tokens)
        bucket = pick_phoneme_bucket(n_valid)
        input_ids = np.zeros((1, bucket), dtype=np.int32)
        input_ids[0, :n_valid] = tokens
        input_ids = jnp.asarray(input_ids)
        lengths = jnp.asarray([n_valid], dtype=jnp.int32)
        ref_s = jnp.asarray(ref_s, dtype=jnp.float32)
        if ref_s.ndim == 1:
            ref_s = ref_s[None]

        d, pred_dur = _duration_stage(
            self, input_ids, lengths, ref_s[:, 128:],
            jnp.asarray([speed], dtype=jnp.float32),
        )
        pred_dur_np = np.asarray(pred_dur)[0, :n_valid]
        total = int(pred_dur_np.sum())
        f_bucket = pick_frame_bucket(total)

        if key is None:
            key = jax.random.PRNGKey(0)
        audio, _ = _synthesis_stage(
            self, input_ids, lengths, d, pred_dur, ref_s, key,
            jnp.zeros((f_bucket,), dtype=jnp.int32),
        )
        audio_np = np.asarray(audio)[0, : total * self.SAMPLES_PER_FRAME]
        return audio_np, pred_dur_np

    def synthesize_batch(
        self,
        phonemes_list: list,
        ref_s: np.ndarray,
        speeds=None,
        key: Optional[jax.Array] = None,
    ):
        """Batched synthesis: B phoneme strings -> list of (audio, pred_dur).

        One duration pass + one synthesis pass for the whole batch (ragged
        lengths via per-row masks — bit-exact w.r.t. single-row runs for
        durations; SineGen noise draws differ by batch layout).  This is the
        single-chip serving-throughput lever: all conv/matmul weight reads
        are shared across the B segments.
        """
        from mlx_audio_tpu.parallel.context import active_mesh, pad_batch_arrays

        b = len(phonemes_list)
        toks = [[0, *self.phonemes_to_ids(p), 0] for p in phonemes_list]
        n_valid = [len(t) for t in toks]
        assert max(n_valid) <= self.context_length
        bucket = pick_phoneme_bucket(max(n_valid))
        input_ids_np = np.zeros((b, bucket), dtype=np.int32)
        for i, t in enumerate(toks):
            input_ids_np[i, : len(t)] = t
        lengths_np = np.asarray(n_valid, dtype=np.int32)
        ref_np = np.asarray(ref_s, dtype=np.float32).reshape(b, -1)
        if speeds is None:
            speeds = np.ones((b,), dtype=np.float32)
        speeds_np = np.ascontiguousarray(
            np.broadcast_to(np.asarray(speeds, np.float32), (b,))
        )
        if key is None:
            key = jax.random.PRNGKey(0)

        def run_stages(model, input_ids, lengths, ref, speeds_j, key):
            """duration -> frame bucket -> synthesis; padded rows (if any)
            predict durations too, so the bucket only considers real rows."""
            d, pred_dur = _duration_stage(model, input_ids, lengths,
                                          ref[:, 128:], speeds_j)
            pred_np = np.asarray(pred_dur)
            totals = pred_np.sum(axis=1)           # padded rows contribute 0
            f_bucket = pick_frame_bucket(int(totals[:b].max()))
            audio, _ = _synthesis_stage(
                model, input_ids, lengths, d, pred_dur, ref, key,
                jnp.zeros((f_bucket,), dtype=jnp.int32),
            )
            return np.asarray(audio), pred_np, totals

        ctx = active_mesh()
        if ctx is not None and ctx.dp > 1:
            # data-parallel pass: pad the batch to a dp multiple (noise
            # draws are per-row, so real rows are bit-exact vs unsharded),
            # shard the batch axis, replicate the weights; XLA partitions
            # the already-jitted stages over the mesh
            input_ids_np, lengths_np, ref_np, speeds_np, _ = pad_batch_arrays(
                ctx, input_ids_np, lengths_np, ref_np, speeds_np
            )
            model = ctx.place_replicated(self)
            with ctx.mesh:
                input_ids, lengths, ref, speeds_j = ctx.shard_batch(
                    jnp.asarray(input_ids_np), jnp.asarray(lengths_np),
                    jnp.asarray(ref_np), jnp.asarray(speeds_np),
                )
                key = jax.device_put(key, ctx.replicated_sharding())
                audio_np, pred_np, totals = run_stages(
                    model, input_ids, lengths, ref, speeds_j, key)
        else:
            audio_np, pred_np, totals = run_stages(
                self, jnp.asarray(input_ids_np), jnp.asarray(lengths_np),
                jnp.asarray(ref_np), jnp.asarray(speeds_np), key)
        return [
            (audio_np[i, : int(totals[i]) * self.SAMPLES_PER_FRAME],
             pred_np[i, : n_valid[i]])
            for i in range(b)
        ]

    def generate_batch(
        self,
        texts: list,
        voice: Optional[str] = None,
        speed: float = 1.0,
        lang_code: str = "a",
        split_pattern: str = r"\n+",
        **kwargs,
    ) -> list:
        """Batched text->speech: G2P each text on host, then synthesize all
        resulting segments in one batched device pass.  Returns one
        GenerationResult per input text (segments concatenated)."""
        from mlx_audio_tpu.models.tts.kokoro.pipeline import KokoroPipeline

        pipeline = KokoroPipeline(model=self, lang_code=lang_code)
        pack = pipeline.load_voice(voice or "af_heart")
        start = time.time()

        seg_ps, owner = [], []
        for ti, text in enumerate(texts):
            for _, ps, _ in pipeline.iter_phoneme_segments(text, split_pattern):
                seg_ps.append(ps)
                owner.append(ti)
        if not seg_ps:
            return [make_generation_result(
                audio=np.zeros((0,), dtype=np.float32),
                sample_rate=self.config.sample_rate, segment_idx=ti,
                token_count=0, segment_time=0.0,
            ) for ti in range(len(texts))]
        refs = np.stack([pack[len(ps) - 1].reshape(-1) for ps in seg_ps])
        outs = self.synthesize_batch(seg_ps, refs, speeds=speed)

        elapsed = time.time() - start
        results = []
        for ti in range(len(texts)):
            segs = [outs[i] for i in range(len(outs)) if owner[i] == ti]
            # one result per text even when G2P yielded nothing: batched
            # servers match results to requests by index
            audio = (np.concatenate([a for a, _ in segs])
                     if segs else np.zeros((0,), dtype=np.float32))
            n_tok = sum(len(p) for i, p in enumerate(seg_ps) if owner[i] == ti)
            results.append(make_generation_result(
                audio=audio, sample_rate=self.config.sample_rate,
                segment_idx=ti, token_count=n_tok,
                segment_time=elapsed / len(texts),
            ))
        return results

    def generate(
        self,
        text: str,
        voice: Optional[str] = None,
        speed: float = 1.0,
        lang_code: str = "a",
        split_pattern: str = r"\n+",
        **kwargs,
    ) -> Iterator[GenerationResult]:
        """Text -> audio segments with the standard metrics record
        (reference kokoro.py:269-346).

        Under an active device mesh (parallel.context.activate_mesh) the
        segments are synthesized in one data-parallel batched pass instead
        of sequentially — the CLI's `--mesh dp=N` path."""
        from mlx_audio_tpu.models.tts.kokoro.pipeline import KokoroPipeline
        from mlx_audio_tpu.parallel.context import active_mesh

        pipeline = KokoroPipeline(model=self, lang_code=lang_code)

        ctx = active_mesh()
        if ctx is not None and ctx.dp > 1:
            pack = pipeline.load_voice(voice or "af_heart")
            start = time.time()
            segs = list(pipeline.iter_phoneme_segments(text, split_pattern))
            if not segs:
                return
            refs = np.stack([pack[len(ps) - 1].reshape(-1)
                             for _, ps, _ in segs])
            outs = self.synthesize_batch([ps for _, ps, _ in segs], refs,
                                         speeds=speed)
            elapsed = time.time() - start
            for idx, ((gs, ps, _), (audio, _)) in enumerate(zip(segs, outs)):
                yield make_generation_result(
                    audio=audio, sample_rate=self.config.sample_rate,
                    segment_idx=idx, token_count=len(ps) if ps else 0,
                    segment_time=elapsed / len(segs),
                )
            return

        start = time.time()
        for idx, (graphemes, phonemes, audio) in enumerate(
            pipeline(text, voice=voice or "af_heart", speed=speed,
                     split_pattern=split_pattern)
        ):
            now = time.time()
            seg_time = now - start
            start = now
            yield make_generation_result(
                audio=audio,
                sample_rate=self.config.sample_rate,
                segment_idx=idx,
                token_count=len(phonemes) if phonemes else 0,
                segment_time=seg_time,
            )

    # -- serving -----------------------------------------------------------

    def prewarm(self, max_phonemes: int = 128, frames_per_phoneme: int = 3,
                batch_sizes=(1,), key: Optional[jax.Array] = None) -> int:
        """Compile the serve-time stage graphs before traffic arrives.

        Stage A jits one graph per (batch, phoneme-bucket) and stage B one
        per (batch, phoneme-bucket, frame-bucket); a live server pays each
        first-seen combination as a multi-second stall in the middle of a
        reply (docs/PERF.md, STS section).  This issues every combination
        reachable up front: phoneme buckets up to ``max_phonemes`` and, per
        phoneme bucket, frame buckets up to ``frames_per_phoneme`` frames
        per phoneme (pred_dur is clipped >= 1 and real speech sits near
        2.5 frames/phoneme, so 3 covers the realistic range).  Dummy
        inputs use the exact dtypes of the ``synthesize`` path, so the jit
        cache keys match the ones live requests produce.  Returns the
        number of stage executions issued (already-cached combinations
        re-issue for ~free, so calling this twice is harmless).
        """
        if key is None:
            key = jax.random.PRNGKey(0)
        issued = 0
        last = None
        for b in batch_sizes:
            for p in PHONEME_BUCKETS:
                if p > pick_phoneme_bucket(max_phonemes):
                    break
                input_ids = jnp.zeros((b, p), dtype=jnp.int32)
                lengths = jnp.full((b,), p, dtype=jnp.int32)
                ref_s = jnp.zeros((b, 256), dtype=jnp.float32)
                speed = jnp.ones((b,), dtype=jnp.float32)
                d, pred_dur = _duration_stage(
                    self, input_ids, lengths, ref_s[:, 128:], speed)
                issued += 1
                f_max = pick_frame_bucket(p * frames_per_phoneme)
                for f in range(FRAME_BUCKET_STEP, f_max + 1,
                               FRAME_BUCKET_STEP):
                    last, _ = _synthesis_stage(
                        self, input_ids, lengths, d, pred_dur, ref_s, key,
                        jnp.zeros((f,), dtype=jnp.int32),
                    )
                    issued += 1
        if last is not None:
            jax.block_until_ready(last)
        return issued

    # -- checkpoint loading ------------------------------------------------

    def sanitize(self, weights: dict) -> dict:
        return sanitize(weights)


def _convert_conv_weight(w: np.ndarray) -> np.ndarray:
    """Torch conv [O, I, K] or MLX conv [O, K, I] -> ours [K, I, O]."""
    if check_array_shape(w):  # already MLX [O, K, I]
        return w.transpose(1, 2, 0)
    return w.transpose(2, 1, 0)


_LSTM_SUFFIXES = {
    "weight_ih_l0_reverse": "Wx_backward",
    "weight_hh_l0_reverse": "Wh_backward",
    "bias_ih_l0_reverse": "bias_ih_backward",
    "bias_hh_l0_reverse": "bias_hh_backward",
    "weight_ih_l0": "Wx_forward",
    "weight_hh_l0": "Wh_forward",
    "bias_ih_l0": "bias_ih_forward",
    "bias_hh_l0": "bias_hh_forward",
}


def sanitize(weights: dict) -> dict:
    """Map reference/torch checkpoint keys+layouts to our pytree paths.

    Port of the rules at kokoro.py:24-44,172-252 and the decoder sanitize
    (istftnet.py:965-979), adapted to this package's [K, I, O] conv layout.
    """
    out = {}
    for key, w in weights.items():
        w = np.asarray(w)
        if "position_ids" in key:
            continue

        # LSTM gate-weight renames apply everywhere
        renamed = None
        for suffix, new in _LSTM_SUFFIXES.items():
            if key.endswith(suffix):
                renamed = key[: -len(suffix)] + new
                break
        if renamed is not None:
            out[renamed] = w
            continue

        # old-style LayerNorm names
        if key.endswith(".gamma"):
            out[key[: -len(".gamma")] + ".weight"] = w
            continue
        if key.endswith(".beta"):
            out[key[: -len(".beta")] + ".bias"] = w
            continue

        if ".duration_proj.linear_layer." in key:
            out[key.replace(".linear_layer.", ".")] = w
            continue

        is_transposed_conv = (".ups." in key) or (".pool." in key)
        if key.endswith("weight_v") and w.ndim == 3:
            if is_transposed_conv:
                # torch convT [in, out/g, k] -> [k, in, out/g]
                out[key] = w.transpose(2, 0, 1)
            else:
                out[key] = _convert_conv_weight(w)
            continue
        if key.endswith("weight_g") and w.ndim == 3:
            if is_transposed_conv:
                out[key] = w.transpose(1, 0, 2)  # [in,1,1] -> [1,in,1]
            else:
                out[key] = w.transpose(1, 2, 0)  # [out,1,1] -> [1,1,out]
            continue

        if (".alpha1." in key or ".alpha2." in key) and w.ndim == 3:
            out[key] = w.reshape(-1)  # [1, C, 1] -> [C]
            continue

        # plain conv weights (noise_convs, F0_proj, N_proj, F0_conv, ...)
        if key.endswith(".weight") and w.ndim == 3:
            out[key] = _convert_conv_weight(w)
            continue

        out[key] = w
    return out


def load_config(config_path_or_dict) -> ModelConfig:
    if isinstance(config_path_or_dict, dict):
        return ModelConfig.from_dict(config_path_or_dict)
    with open(config_path_or_dict) as f:
        return ModelConfig.from_dict(json.load(f))
