"""Chat text-LM stage for the speech-to-speech assistant.

The reference's VoicePipeline loads an mlx_lm chat model and generates the
assistant's reply (/root/reference/mlx_audio/sts/voice_pipeline.py:55-60,
198-221); round 1 shipped only a passthrough echo.  This wraps the shared
TPU causal-LM decode loop (models/lm/causal.py) with a HF chat-template
tokenizer so `--llm-model` works end-to-end: Llama / Qwen2 / Qwen3-family
checkpoints in the standard HF layout.
"""

from __future__ import annotations

import logging
from typing import List, Optional

import numpy as np

logger = logging.getLogger("mlx_audio_tpu.chat")

from mlx_audio_tpu.models.lm.causal import LlamaForCausalLM, generate_tokens_batch
from mlx_audio_tpu.models.lm.llama import LlamaConfig

# Same behavioral spec as the reference system prompt
# (sts/voice_pipeline.py:209-212): short conversational sentences, no
# unspeakable punctuation.
SYSTEM_PROMPT = (
    "You are a helpful voice assistant. You always respond with short "
    "sentences and never use punctuation like parentheses or colons that "
    "wouldn't appear in conversational speech."
)


def llama_config_from_hf(config: dict) -> LlamaConfig:
    """HF llama/qwen2/qwen3 config.json -> LlamaConfig."""
    hidden = config["hidden_size"]
    heads = config["num_attention_heads"]
    mtype = str(config.get("model_type", "llama")).lower()
    return LlamaConfig(
        num_hidden_layers=config["num_hidden_layers"],
        num_attention_heads=heads,
        num_key_value_heads=config.get("num_key_value_heads", heads),
        head_dim=config.get("head_dim") or hidden // heads,
        hidden_size=hidden,
        intermediate_size=config["intermediate_size"],
        rms_norm_eps=config.get("rms_norm_eps", 1e-5),
        vocab_size=config["vocab_size"],
        max_position_embeddings=min(
            config.get("max_position_embeddings", 8192), 8192
        ),
        attention_bias=config.get("attention_bias", False),
        mlp_bias=config.get("mlp_bias", False),
        rope_theta=config.get("rope_theta", 10000.0),
        rope_scaling=config.get("rope_scaling"),
        tie_word_embeddings=config.get("tie_word_embeddings", False),
        qkv_bias=mtype == "qwen2",
        use_qk_norm=mtype == "qwen3",
    )


def sanitize_hf_causal_lm(weights: dict) -> dict:
    """HF `model.*` / `lm_head.*` keys map 1:1 under LlamaForCausalLM.
    Non-parameter buffers some conversions ship (rotary inv_freq tables,
    attention bias masks) are dropped — RoPE tables are recomputed."""
    out = {}
    for k, v in weights.items():
        if k.endswith("rotary_emb.inv_freq") or k.endswith(".attn.bias") \
                or k.endswith(".attn.masked_bias"):
            continue
        if k.startswith("model.") or k.startswith("lm_head"):
            out[k] = np.asarray(v)
        else:
            out["model." + k] = np.asarray(v)
    return out


class ChatLM:
    """A conversational text LM: HF checkpoint + chat template + the jitted
    batched decode loop."""

    def __init__(self, model: LlamaForCausalLM, tokenizer,
                 max_tokens: int = 256, temperature: float = 0.6,
                 top_p: float = 0.9, system_prompt: str = SYSTEM_PROMPT):
        self.model = model
        self.tokenizer = tokenizer
        self.max_tokens = max_tokens
        self.temperature = temperature
        self.top_p = top_p
        self.system_prompt = system_prompt

    @classmethod
    def from_pretrained(cls, path_or_repo: str, dtype=None,
                        tokenizer=None, **kwargs) -> "ChatLM":
        from mlx_audio_tpu.nn.module import update_arrays
        from mlx_audio_tpu.utils.loader import (
            get_model_path,
            load_config,
            load_weights_files,
        )

        path = get_model_path(path_or_repo)
        config = load_config(path)
        model = LlamaForCausalLM(llama_config_from_hf(config))
        weights = load_weights_files(path)
        model = update_arrays(model, sanitize_hf_causal_lm(weights))
        if dtype is not None:
            import jax.numpy as jnp
            from mlx_audio_tpu.nn.module import map_arrays

            def cast(p, x):
                if "rope_cos" in p or "rope_sin" in p:
                    return x
                return x.astype(dtype) if jnp.issubdtype(
                    x.dtype, jnp.floating) else x

            model = map_arrays(model, cast)
        if tokenizer is None:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(str(path))
        return cls(model, tokenizer, **kwargs)

    def _stop_tokens(self) -> tuple:
        stops = set()
        eos = getattr(self.tokenizer, "eos_token_id", None)
        if eos is not None:
            if isinstance(eos, (list, tuple)):
                stops.update(int(e) for e in eos)
            else:
                stops.add(int(eos))
        # llama3 chat ends turns with <|eot_id|>; tokenizers that lack the
        # token return unk_token_id (sentencepiece) — excluding it keeps
        # <unk> from silently truncating replies
        unk = getattr(self.tokenizer, "unk_token_id", None)
        for tok in ("<|eot_id|>", "<|im_end|>"):
            try:
                tid = self.tokenizer.convert_tokens_to_ids(tok)
                if tid is not None and tid >= 0 and tid != unk:
                    stops.add(int(tid))
            except Exception:
                pass
        return tuple(stops)

    def _tokenize_messages(self, messages: List[dict]) -> List[int]:
        if hasattr(self.tokenizer, "apply_chat_template"):
            return self.tokenizer.apply_chat_template(
                messages, tokenize=True, add_generation_prompt=True
            )
        # plain tokenizer: fall back to a simple transcript format
        prompt = "".join(
            f"{m['role']}: {m['content']}\n" for m in messages
        ) + "assistant:"
        return self.tokenizer.encode(prompt)

    def _build_prompt_ids(self, text: str,
                          history: Optional[List[dict]] = None) -> List[int]:
        """Chat-template prompt with drop-oldest context eviction.

        Long sessions forget instead of failing: when prompt tokens plus
        the generation budget would overflow the model's context, the
        OLDEST history turns are dropped (system prompt and the current
        user message always survive) and the prompt is re-tokenized."""
        history = list(history or [])
        budget = self.model.config.max_position_embeddings - self.max_tokens

        def build():
            return ([{"role": "system", "content": self.system_prompt}]
                    + history
                    + [{"role": "user", "content": text}])

        ids = self._tokenize_messages(build())
        while len(ids) > budget and history:
            history.pop(0)           # drop-oldest eviction
            ids = self._tokenize_messages(build())
        if len(ids) > budget:
            # system + current user message alone overflow the context:
            # keep the TAIL (the user's text matters most) rather than
            # letting positions run past the RoPE table, and say so
            logger.warning(
                "chat prompt (%d tokens) exceeds the %d-token context "
                "budget even with empty history; truncating to the tail",
                len(ids), budget,
            )
            ids = ids[-budget:]
        return ids

    def respond(self, text: str,
                history: Optional[List[dict]] = None,
                seed: int = 0) -> str:
        """One chat turn: history + user text -> assistant reply (reference
        _generate_response, sts/voice_pipeline.py:198-221; the reference
        keeps no history at all — ours is a superset)."""
        ids = self._build_prompt_ids(text, history)
        out = generate_tokens_batch(
            self.model, [np.asarray(ids, dtype=np.int32)],
            max_tokens=self.max_tokens, temperature=self.temperature,
            top_p=self.top_p, stop_tokens=self._stop_tokens(), seed=seed,
        )[0]
        return self.tokenizer.decode(
            out.tolist(), skip_special_tokens=True
        ).strip()

    def respond_stream(self, text: str,
                       history: Optional[List[dict]] = None,
                       seed: int = 0, chunk: int = 8):
        """Streaming chat turn: yields the decoded reply-so-far after every
        ``chunk`` generated tokens (monotone snapshots; the last yield is
        the full reply).  This is what lets the STS pipeline start TTS at
        the first sentence boundary instead of after the whole reply
        (reference behavior being beaten: sts/voice_pipeline.py:193-267
        fully serializes LLM -> TTS)."""
        from mlx_audio_tpu.models.lm.causal import generate_tokens

        ids = self._build_prompt_ids(text, history)
        toks: List[int] = []
        for piece in generate_tokens(
            self.model, np.asarray(ids, dtype=np.int32),
            max_tokens=self.max_tokens, temperature=self.temperature,
            top_p=self.top_p, stop_tokens=self._stop_tokens(), chunk=chunk,
            seed=seed,
        ):
            toks.extend(piece.tolist())
            yield self.tokenizer.decode(
                toks, skip_special_tokens=True
            ).strip()

    def prewarm(self, buckets=None, max_prompt: int = 512) -> int:
        """Compile the chat decode graphs before serving.

        ``generate_tokens`` jits one prefill + one decode-chunk graph per
        64-step prompt bucket (the cache length is bucket + max_tokens,
        so every new bucket recompiles BOTH).  STS prompts grow with the
        conversation history, which means a live session hits a fresh
        bucket — and a multi-second stall — every few turns.  Issue one
        full-budget turn per bucket with the session's real sampling
        params (compile keys must match), WITHOUT stop tokens: the final
        ragged chunk (``chunk = budget % 8``) is its own static compile
        key, so the warm turn must decode to the end to build it.

        By default EVERY 64-step bucket up to ``max_prompt`` is warmed —
        skipping any bucket (e.g. 192) just moves its compile stall to
        whichever live turn first grows the history across it.  Returns
        the number of buckets warmed.
        """
        from mlx_audio_tpu.models.lm.causal import generate_tokens

        # _build_prompt_ids never produces a prompt past the context
        # budget, so buckets beyond it are unreachable at serve time
        budget = self.model.config.max_position_embeddings - self.max_tokens
        if buckets is None:
            buckets = range(64, min(budget, max_prompt) + 1, 64)
        buckets = tuple(b for b in buckets if b <= budget)
        for b in buckets:
            ids = np.full((b,), 3, dtype=np.int32)
            for _piece in generate_tokens(
                self.model, ids, max_tokens=self.max_tokens,
                temperature=self.temperature, top_p=self.top_p,
                stop_tokens=(), chunk=8, seed=0,
            ):
                pass
        return len(buckets)

    # the VoicePipeline calls its llm stage as a callable(text)->text
    __call__ = respond
