"""Spark-TTS: Qwen2-0.5B LM over BiCodec semantic/global tokens.

Capability parity with /root/reference/mlx_audio/tts/models/spark/spark.py:
29-380 — voice cloning (reference audio -> global/semantic prompt tokens)
and controllable synthesis (gender/pitch/speed style tokens), decoded to
waveform by BiCodec.

TPU design:
* The LM is the shared LlamaForCausalLM decode loop (models/lm/causal.py):
  bucketed left-padded prefill + jitted lax.scan chunks, instead of the
  reference's per-token python stream_generate (spark.py:275-295).
  Qwen2 = llama architecture with qkv_bias=True and tied embeddings.
* BiCodec detokenization is one jitted graph (bicodec.py detokenize).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

from mlx_audio_tpu.models.base import BaseModelArgs, make_generation_result
from mlx_audio_tpu.models.lm.causal import LlamaForCausalLM, generate_tokens
from mlx_audio_tpu.models.lm.llama import LlamaConfig
from mlx_audio_tpu.nn import Module

from .audio_tokenizer import BiCodecTokenizer
from .bicodec import BiCodec
from .token_parser import (
    build_clone_prompt,
    build_control_prompt,
    parse_generated_tokens,
)

# float UI factors -> level names (reference spark.py:21-27)
PITCH_MAP = SPEED_MAP = {
    0.0: "very_low", 0.5: "low", 1.0: "moderate", 1.5: "high", 2.0: "very_high",
}

END_OF_SPEECH = 128258  # reference stop check, spark.py:289


@dataclass
class ModelConfig(BaseModelArgs):
    model_path: Optional[Path] = None
    tokenizer_name: Optional[str] = None
    sample_rate: int = 16000
    bos_token_id: int = 151643
    eos_token_id: int = 151645
    hidden_size: int = 896
    intermediate_size: int = 4864
    max_position_embeddings: int = 32768
    model_type: str = "spark"
    num_attention_heads: int = 14
    num_hidden_layers: int = 24
    num_key_value_heads: int = 2
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1000000.0
    tie_word_embeddings: bool = True
    vocab_size: int = 166000
    rope_scaling: Optional[Dict[str, Any]] = None

    def llama_config(self) -> LlamaConfig:
        return LlamaConfig(
            num_hidden_layers=self.num_hidden_layers,
            num_attention_heads=self.num_attention_heads,
            num_key_value_heads=self.num_key_value_heads,
            head_dim=self.hidden_size // self.num_attention_heads,
            hidden_size=self.hidden_size,
            intermediate_size=self.intermediate_size,
            rms_norm_eps=self.rms_norm_eps,
            vocab_size=self.vocab_size,
            max_position_embeddings=self.max_position_embeddings,
            rope_theta=self.rope_theta,
            rope_scaling=self.rope_scaling,
            tie_word_embeddings=self.tie_word_embeddings,
            qkv_bias=True,
        )


class Model(Module):
    def __init__(self, config: ModelConfig, bicodec: Optional[BiCodec] = None,
                 wav2vec2=None, tokenizer=None):
        self.config = config
        self.lm = LlamaForCausalLM(config.llama_config())
        self.bicodec = bicodec if bicodec is not None else BiCodec()
        self._audio_tokenizer = BiCodecTokenizer(
            bicodec=self.bicodec, wav2vec2=wav2vec2
        )
        self._tokenizer = tokenizer

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    @property
    def model_type(self) -> str:
        return "spark"

    @property
    def tokenizer(self):
        if self._tokenizer is None:
            from transformers import AutoTokenizer

            name = self.config.tokenizer_name or str(self.config.model_path)
            self._tokenizer = AutoTokenizer.from_pretrained(name)
        return self._tokenizer

    # -- prompts (reference spark.py:107-206) ------------------------------

    def process_prompt(self, text: str, ref_audio, ref_text: Optional[str],
                       ref_tokens=None):
        """Build the voice-clone prompt.  ``ref_tokens`` (a prior
        tokenize(ref_audio) result) avoids re-running the wav2vec2 +
        BiCodec reference pass per text segment."""
        if ref_tokens is None:
            ref_tokens = self._audio_tokenizer.tokenize(ref_audio)
        global_tokens, semantic_tokens = ref_tokens
        prompt = build_clone_prompt(
            text, ref_text,
            np.asarray(global_tokens).reshape(-1),
            np.asarray(semantic_tokens).reshape(-1),
        )
        return prompt, np.asarray(global_tokens).reshape(1, -1)

    def process_prompt_control(self, gender: str, pitch: str, speed: str,
                               text: str):
        return build_control_prompt(text, gender, pitch=pitch, speed=speed)

    # -- generation --------------------------------------------------------

    def generate(self, text: str, ref_audio=None, ref_text: Optional[str] = None,
                 gender: str = "male", pitch: float = 1.0, speed: float = 1.0,
                 temperature: float = 0.8, top_k: int = 50, top_p: float = 0.95,
                 max_tokens: int = 3000, verbose: bool = False,
                 split_pattern: str = "\n", seed: int = 0, **kwargs):
        pitch_level = PITCH_MAP.get(pitch, pitch if isinstance(pitch, str)
                                    else "moderate")
        speed_level = SPEED_MAP.get(speed, speed if isinstance(speed, str)
                                    else "moderate")
        if ref_audio is not None:  # voice cloning overrides control attrs
            gender = None

        # multi-segment control-mode text under a dp>1 mesh: one batched
        # DP pass instead of the sequential segment loop
        from mlx_audio_tpu.parallel.context import active_mesh

        segments = [s for s in text.split(split_pattern) if s.strip()]
        ctx = active_mesh()
        if (ctx is not None and ctx.dp > 1 and len(segments) > 1
                and ref_audio is None and gender is not None):
            yield from self.generate_batch(
                segments, gender=gender, pitch=pitch, speed=speed,
                temperature=temperature, top_k=top_k, top_p=top_p,
                max_tokens=max_tokens, seed=seed, **kwargs,
            )
            return

        # tokenize the reference ONCE; every segment reuses the tokens
        ref_tokens = (self._audio_tokenizer.tokenize(ref_audio)
                      if ref_audio is not None and gender is None else None)
        for segment_idx, text_split in enumerate(text.split(split_pattern)):
            if not text_split.strip():
                continue
            if gender is not None:
                prompt = self.process_prompt_control(
                    gender, pitch_level, speed_level, text_split
                )
                global_token_ids = None
            else:
                prompt, global_token_ids = self.process_prompt(
                    text_split, ref_audio, ref_text, ref_tokens=ref_tokens
                )
            input_ids = self.tokenizer(prompt, return_tensors="np").input_ids[0]

            t0 = time.time()
            generated = []
            for chunk in generate_tokens(
                self.lm, input_ids, max_tokens=max_tokens,
                temperature=temperature, top_k=top_k, top_p=top_p,
                repetition_penalty=kwargs.get("repetition_penalty", 1.3),
                repetition_context_size=kwargs.get("repetition_context_size", 20),
                stop_tokens=(self.config.eos_token_id, END_OF_SPEECH),
                seed=seed + segment_idx,
            ):
                generated.extend(int(t) for t in chunk)

            predicts = self.tokenizer.decode(generated, skip_special_tokens=False)
            semantic_ids, global_ids = parse_generated_tokens(predicts)
            if global_token_ids is None:
                global_token_ids = np.asarray(global_ids, dtype=np.int32)[None]
            if len(semantic_ids) == 0:
                continue
            audio = self._audio_tokenizer.detokenize(
                global_token_ids.astype(np.int32),
                np.asarray(semantic_ids, dtype=np.int32)[None],
            )
            yield make_generation_result(
                np.asarray(audio).reshape(-1), self.config.sample_rate,
                segment_idx, len(semantic_ids), time.time() - t0,
            )

    def generate_batch(self, texts, gender: str = "male", pitch=1.0,
                       speed=1.0, temperature: float = 0.8, top_k: int = 50,
                       top_p: float = 0.95, max_tokens: int = 3000,
                       seed: int = 0, **kwargs):
        """Batched control-mode synthesis: one jitted LM decode for all
        texts (weights read once per step — docs/PERF.md), then per-row
        BiCodec detokenize.  Returns one GenerationResult per text."""
        from mlx_audio_tpu.models.lm.causal import generate_tokens_batch

        pitch_level = PITCH_MAP.get(pitch, pitch if isinstance(pitch, str)
                                    else "moderate")
        speed_level = SPEED_MAP.get(speed, speed if isinstance(speed, str)
                                    else "moderate")
        prompts = [
            self.tokenizer(
                self.process_prompt_control(gender, pitch_level, speed_level,
                                            t),
                return_tensors="np",
            ).input_ids[0]
            for t in texts
        ]
        t0 = time.time()
        outs = generate_tokens_batch(
            self.lm, prompts, max_tokens=max_tokens, temperature=temperature,
            top_k=top_k, top_p=top_p,
            repetition_penalty=kwargs.get("repetition_penalty", 1.3),
            repetition_context_size=kwargs.get("repetition_context_size", 20),
            stop_tokens=(self.config.eos_token_id, END_OF_SPEECH), seed=seed,
        )
        elapsed = time.time() - t0
        # parse every row, then detokenize rows with matching
        # (semantic, global) lengths as ONE batched BiCodec call — full-
        # budget rows (and served batches of similar texts) collapse to a
        # single vocoder dispatch instead of B (docs/PERF.md Spark e2e)
        parsed = []
        for generated in outs:
            predicts = self.tokenizer.decode(generated.tolist(),
                                             skip_special_tokens=False)
            parsed.append(parse_generated_tokens(predicts))
        audios: dict = {}
        groups: dict = {}
        for i, (sem, glo) in enumerate(parsed):
            if len(sem) == 0:
                audios[i] = np.zeros((0,), dtype=np.float32)
            else:
                groups.setdefault((len(sem), len(glo)), []).append(i)
        for (ls, lg), idxs in groups.items():
            sem = np.asarray([parsed[i][0] for i in idxs], dtype=np.int32)
            glo = np.asarray([parsed[i][1] for i in idxs], dtype=np.int32)
            wavs = np.asarray(self._audio_tokenizer.detokenize(glo, sem))
            wavs = wavs.reshape(len(idxs), -1)
            for row, i in enumerate(idxs):
                audios[i] = wavs[row]
        results = []
        for i in range(len(outs)):
            results.append(make_generation_result(
                audios[i], self.config.sample_rate,
                i, len(parsed[i][0]), elapsed / max(len(texts), 1),
            ))
        return results

    # -- weights -----------------------------------------------------------

    def sanitize(self, weights: dict) -> dict:
        """Route Spark's three checkpoints into one pytree: LLM (HF qwen2
        keys) -> lm.*, BiCodec -> bicodec.* (torch conv layout fixes),
        wav2vec2 -> _audio_tokenizer's model loaded separately."""
        lm_w, bicodec_w, out = {}, {}, {}
        bicodec_roots = ("encoder.", "decoder.", "quantizer.",
                         "speaker_encoder.", "prenet.", "postnet.")
        for k, v in weights.items():
            if k.startswith("lm.") or k.startswith("bicodec."):
                out[k] = np.asarray(v)
            elif k.startswith(bicodec_roots):
                bicodec_w[k] = v
            elif k.startswith("model.") or k.startswith("lm_head"):
                lm_w[k] = v
            else:
                out[k] = np.asarray(v)
        for k, v in self.bicodec.sanitize(bicodec_w).items():
            out[f"bicodec.{k}"] = v
        for k, v in lm_w.items():
            out[f"lm.{k}"] = np.asarray(v)
        return out
