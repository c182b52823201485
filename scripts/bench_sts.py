#!/usr/bin/env python
"""Speech-to-speech turn latency through the REAL transport: sim-mic
16 kHz utterance -> /ws/sts websocket -> STT -> chat LLM -> TTS -> first
audio byte back.  Reports p50/p95 time-to-first-audio over N turns
(reference behavior being measured: sts/voice_pipeline.py:193-231 +
server.py websocket transport).

Models are real dimensions with random weights (no checkpoints in this
environment — same convention as bench_whisper/bench_causal_lm):
Whisper large-v3-turbo STT, Qwen2-0.5B-dims ChatLM, Kokoro-82M TTS.

Usage: python scripts/bench_sts.py [--turns 6] [--utt-secs 2.0] [--json]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import asyncio
import json
import tempfile
import time

import numpy as np


class _ChatTokenizer:
    """Synthetic chat-template tokenizer (no HF assets offline)."""

    eos_token_id = 2

    def apply_chat_template(self, messages, tokenize=True,
                            add_generation_prompt=True):
        text = " ".join(m["content"] for m in messages)
        return [3 + (ord(c) % 800) for c in text][-512:]

    def decode(self, ids, skip_special_tokens=True):
        # a period every ~6 words gives the decoded reply realistic
        # sentence boundaries, so the streaming path (sentence -> TTS
        # while the LLM decodes on) is actually exercised
        return " ".join(
            f"w{i}." if (j + 1) % 6 == 0 else f"w{i}"
            for j, i in enumerate(ids)
        )

    def convert_tokens_to_ids(self, tok):
        return None


class _BenchSTT:
    """Whisper with latency-bench decode options (greedy, fixed language —
    random weights would otherwise cascade through temperature fallback)."""

    def __init__(self, model):
        self.model = model
        self.sample_rate = 16000

    def generate(self, audio, **kw):
        return self.model.generate(
            np.asarray(audio, dtype=np.float32), temperature=0.0,
            language="en", condition_on_previous_text=False,
            no_speech_threshold=None,
        )


def build_models():
    import jax.numpy as jnp

    from mlx_audio_tpu.models.lm.causal import LlamaForCausalLM
    from mlx_audio_tpu.models.lm.chat import ChatLM
    from mlx_audio_tpu.models.lm.llama import LlamaConfig
    from mlx_audio_tpu.models.stt.whisper.model import ModelDimensions
    from mlx_audio_tpu.models.stt.whisper.transcribe import Model as Whisper
    from mlx_audio_tpu.models.tts.kokoro.model import Model as Kokoro
    from mlx_audio_tpu.models.tts.kokoro.presets import kokoro_82m_config

    whisper = Whisper(ModelDimensions(
        n_mels=128, n_audio_ctx=1500, n_audio_state=1280, n_audio_head=20,
        n_audio_layer=32, n_vocab=51866, n_text_ctx=448, n_text_state=1280,
        n_text_head=20, n_text_layer=4,
    )).astype(jnp.bfloat16)

    lm_cfg = LlamaConfig(
        num_hidden_layers=24, num_attention_heads=14, num_key_value_heads=2,
        head_dim=64, hidden_size=896, intermediate_size=4864,
        rms_norm_eps=1e-6, vocab_size=2048, max_position_embeddings=4096,
        rope_theta=1_000_000, tie_word_embeddings=True, qkv_bias=True,
    )
    chat = ChatLM(LlamaForCausalLM(lm_cfg).astype(jnp.bfloat16),
                  _ChatTokenizer(), max_tokens=32, temperature=0.6)

    kokoro = Kokoro(kokoro_82m_config()).astype(jnp.bfloat16)
    # Random duration heads predict ~25 frames/phoneme (sigmoid sum ~
    # max_dur/2) where real Kokoro checkpoints sit near 2.5 — pushing
    # every reply sentence into frame buckets far outside the serving
    # envelope prewarm covers.  Pin the head to the realistic rate
    # (weight=0, bias=logit(2.5/50)) so the bench exercises the envelope
    # a deployed server sees — same spirit as _BenchSTT's fixed-language
    # greedy shim for random-weight STT.
    dp = kokoro.predictor.duration_proj
    dp.weight = jnp.zeros_like(dp.weight)
    dp.bias = jnp.full_like(dp.bias, float(np.log(0.05 / 0.95)))
    return _BenchSTT(whisper), chat, kokoro


async def run_turns(app, utt, turns, endpoint_silence=1.2):
    """Drive /ws/sts exactly like the browser client (audio_player.html):
    stream the utterance, then stream ~1.2 s of silence frames (the
    client-side endpointing window), then "flush".  A concurrent reader
    timestamps the FIRST audio byte the moment it arrives — with round-5
    adaptive endpointing the server commits the turn DURING the silence
    window, so the reply usually lands before the flush is even sent.
    Primary metric: speech-end -> first audio (what the user feels);
    flush -> first audio is kept for comparison with rounds 3/4 (negative
    = the reply beat the flush)."""
    import json as _json

    from aiohttp.test_utils import TestClient, TestServer

    first_audio_ms, from_speech_ms = [], []
    sil = np.zeros(int(0.15 * 16000), dtype=np.float32)
    async with TestClient(TestServer(app)) as client:
        async with client.ws_connect("/ws/sts") as ws:
            for i in range(turns):
                got = {"t_audio": None}
                done = asyncio.Event()

                async def reader():
                    saw_audio = False
                    while True:
                        msg = await ws.receive(timeout=1200)
                        if msg.type.name == "BINARY":
                            if got["t_audio"] is None:
                                got["t_audio"] = time.perf_counter()
                            saw_audio = True
                        elif msg.type.name == "TEXT":
                            data = _json.loads(msg.data)
                            # the final json (assistant transcript) closes
                            # the turn; the header json has user_transcript
                            if "transcript" in data:
                                done.set()
                                return saw_audio

                rt = asyncio.create_task(reader())
                await ws.send_bytes(utt.tobytes())
                t_speech_end = time.perf_counter()
                n_sil = max(1, int(endpoint_silence / 0.15))
                for _ in range(n_sil):
                    await ws.send_bytes(sil.tobytes())
                    await asyncio.sleep(0.15)   # real-time silence frames
                await ws.send_str("flush")
                t_flush = time.perf_counter()
                await done.wait()
                await rt
                t_a = got["t_audio"] or time.perf_counter()
                first_audio_ms.append((t_a - t_flush) * 1e3)
                from_speech_ms.append((t_a - t_speech_end) * 1e3)
                print(f"turn {i}: flush->audio {first_audio_ms[-1]:.0f} ms  "
                      f"speech-end->audio {from_speech_ms[-1]:.0f} ms",
                      flush=True)
    return first_audio_ms, from_speech_ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=6)
    ap.add_argument("--utt-secs", type=float, default=2.0)
    ap.add_argument("--prewarm", action="store_true",
                    help="run VoicePipeline.prewarm before the turns "
                         "(the server's --prewarm flag) and report how "
                         "long it took; kills the first-seen-bucket jit "
                         "stalls that otherwise dominate p95")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    from mlx_audio_tpu.server import ServerState, create_app

    stt, chat, kokoro = build_models()

    tmp = tempfile.mkdtemp()
    rng = np.random.default_rng(0)
    pack = (rng.standard_normal((510, 1, 256)) * 0.1).astype(np.float32)
    vpath = f"{tmp}/voice.npy"
    np.save(vpath, pack)

    state = ServerState(output_folder=tmp)
    # repo ids must match the VoicePipelineConfig defaults so get_tts/
    # get_stt return the injected random-weight models instead of
    # attempting an HF load
    state.stt_model = stt
    state.stt_repo = "mlx-community/whisper-large-v3-turbo"
    state.tts_model = kokoro
    state.tts_repo = "prince-canuma/Kokoro-82M"
    state.sts_options = {"tts_voice": vpath}

    # inject the chat LLM (the pipeline otherwise loads from sts_options)
    import mlx_audio_tpu.sts.voice_pipeline as vp

    orig_init = vp.VoicePipeline.init_models

    def init_with_llm(self):
        self._llm = self._llm or chat
        return orig_init(self)

    vp.VoicePipeline.init_models = init_with_llm

    t = np.arange(int(args.utt_secs * 16000)) / 16000
    utt = (0.1 * np.sin(2 * np.pi * 220 * t)
           + 0.02 * rng.standard_normal(t.shape)).astype(np.float32)

    prewarm_s = None
    if args.prewarm:
        t0 = time.time()
        issued = vp.VoicePipeline(
            config=vp.VoicePipelineConfig(**state.sts_options),
            server_state=state,
        ).prewarm()
        prewarm_s = time.time() - t0
        print(f"prewarm: {issued} graph executions in {prewarm_s:.1f} s")

    app = create_app(state)
    first_ms, from_speech_ms = asyncio.new_event_loop().run_until_complete(
        run_turns(app, utt, args.turns + 1))
    first_ms = first_ms[1:]                    # drop the compile turn
    from_speech_ms = from_speech_ms[1:]
    p50 = float(np.percentile(first_ms, 50))
    p95 = float(np.percentile(first_ms, 95))
    sp50 = float(np.percentile(from_speech_ms, 50))
    sp95 = float(np.percentile(from_speech_ms, 95))
    print(f"STS turn speech-end->first-audio: p50 {sp50:.0f} ms  "
          f"p95 {sp95:.0f} ms  (flush->first-audio p50 {p50:.0f} ms, "
          f"negative = adaptive endpoint beat the client flush; "
          f"{len(first_ms)} turns, {args.utt_secs:.1f}s utterances)")
    if args.json:
        print(json.dumps({
            "metric": "sts_speech_end_first_audio_p50",
            "value": round(sp50, 1), "unit": "ms",
            "speech_end_p95_ms": round(sp95, 1),
            "flush_p50_ms": round(p50, 1), "flush_p95_ms": round(p95, 1),
            "turns": len(first_ms), "utt_secs": args.utt_secs,
            "prewarm_s": None if prewarm_s is None else round(prewarm_s, 1),
        }))


if __name__ == "__main__":
    main()
