"""Realtime speech-to-speech assistant pipeline.

Capability parity with /root/reference/mlx_audio/sts/voice_pipeline.py:
22-327: async mic -> VAD -> STT -> LLM -> TTS -> speaker with barge-in.

TPU design differences:
* VAD is energy-based with hangover frames (the reference's webrtcvad
  fallback path, voice_pipeline.py:96-106); webrtcvad plugs in if present.
* No global device lock (the reference serializes all MLX work through one
  asyncio.Lock, :53): XLA serializes per-device execution, and stages can
  be pinned to different mesh slices via the `parallel` module.
* All model stages are pluggable so the pipeline runs headless (websocket
  transport in server.py) as well as against microphones.
"""

from __future__ import annotations

import asyncio
import logging
import time
from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np

logger = logging.getLogger("mlx_audio_tpu.sts")


@dataclass
class VoicePipelineConfig:
    sample_rate: int = 16000
    frame_duration_ms: int = 30
    silence_threshold: float = 0.015     # energy VAD threshold
    silence_duration: float = 1.5        # endpoint after this much silence
    max_utterance_seconds: float = 30.0
    # adaptive endpointing: once the speculative transcript is ready and
    # this much trailing silence has passed, the server commits the turn
    # without waiting out the client's full endpoint window
    adaptive_endpoint: bool = True
    adaptive_min_silence: float = 0.5
    stt_model: str = "mlx-community/whisper-large-v3-turbo"
    llm_model: Optional[str] = None
    tts_model: str = "prince-canuma/Kokoro-82M"
    tts_voice: str = "af_heart"
    tts_speed: float = 1.0
    tts_language: str = "a"


class EnergyVAD:
    """Frame-level energy VAD with adaptive noise floor (the reference's
    fallback detector, voice_pipeline.py:96-106)."""

    def __init__(self, threshold: float = 0.015, hangover: int = 8):
        self.threshold = threshold
        self.hangover = hangover
        self._noise_ema = 1e-4
        self._active = 0

    def is_speech(self, frame: np.ndarray) -> bool:
        energy = float(np.sqrt(np.mean(frame.astype(np.float64) ** 2)))
        self._noise_ema = 0.98 * self._noise_ema + 0.02 * min(energy, self.threshold)
        if energy > max(self.threshold, 4 * self._noise_ema):
            self._active = self.hangover
            return True
        if self._active > 0:
            self._active -= 1
            return True
        return False


class SpeculativeTranscriber:
    """Hide STT latency inside the endpointing silence window.

    Every STS client (ours included, audio_player.html ~1.2 s; the
    reference's ReplyOnPause likewise) must observe a silence window
    before deciding the user finished — during which the server
    traditionally idles.  This tracker watches the incoming frame stream
    and, once `spec_silence` seconds of trailing silence follow speech,
    LAUNCHES transcription of the audio-so-far in an executor.  If no
    speech arrives afterwards, the endpoint's transcription is already
    done (or in flight) when the turn is committed; if speech resumes,
    the speculative result is discarded and the watcher re-arms.

    The result is used only when the committed audio differs from the
    speculated snapshot purely by trailing sub-threshold samples, so the
    quality contract is unchanged (silence pads to the same 30 s STT
    window).  New capability vs the reference, whose pipeline starts STT
    only after endpointing (sts/voice_pipeline.py:108-165).
    """

    def __init__(self, transcribe_fn, sample_rate: int = 16000,
                 silence_threshold: float = 0.015,
                 spec_silence: float = 0.25,
                 frame_duration_ms: int = 30):
        self.transcribe_fn = transcribe_fn
        self.sample_rate = sample_rate
        self.threshold = silence_threshold
        self.spec_silence = spec_silence
        self.frame_len = int(sample_rate * frame_duration_ms / 1000)
        self.reset()

    def reset(self):
        self._n_fed = 0
        self._buffer: list = []
        self._silent_run = 0.0       # trailing silence seconds
        self._seen_speech = False
        self._task = None
        self._cov = 0                # samples covered by the launched task
        self.launches = 0            # observability / tests

    def _frame_energy(self, frame: np.ndarray) -> float:
        return float(np.sqrt(np.mean(frame.astype(np.float64) ** 2)))

    @property
    def seen_speech(self) -> bool:
        """Speech observed since the last reset (i.e. an utterance is
        pending commit)."""
        return self._seen_speech

    @property
    def ready(self) -> bool:
        """The speculative transcription has finished computing."""
        return self._task is not None and self._task.done()

    @property
    def trailing_silence(self) -> float:
        """Seconds of silence since the last speech frame."""
        return self._silent_run

    def feed(self, frames: np.ndarray, loop=None):
        """Track the stream; launch/invalidate the speculative task."""
        frames = np.asarray(frames, dtype=np.float32).reshape(-1)
        self._buffer.append(frames)
        self._n_fed += len(frames)
        for start in range(0, len(frames) - self.frame_len + 1,
                           self.frame_len):
            e = self._frame_energy(frames[start:start + self.frame_len])
            if e > self.threshold:
                self._seen_speech = True
                self._silent_run = 0.0
                if self._task is not None:
                    # speech after the speculated snapshot: result invalid
                    self._task = None
                    self._cov = 0
            else:
                self._silent_run += self.frame_len / self.sample_rate
        if (self._task is None and self._seen_speech
                and self._silent_run >= self.spec_silence):
            snapshot = np.concatenate(self._buffer)
            self._cov = len(snapshot)
            lp = loop or asyncio.get_event_loop()
            self._task = lp.run_in_executor(None, self.transcribe_fn,
                                            snapshot)
            self.launches += 1

    async def take(self, audio: np.ndarray) -> Optional[str]:
        """Return the speculative transcript for `audio` if it is valid
        (covers a prefix and the remainder is sub-threshold), else None.
        Resets the tracker either way (turn committed)."""
        task, cov = self._task, self._cov
        self.reset()
        if task is None:
            return None
        audio = np.asarray(audio, dtype=np.float32).reshape(-1)
        if cov > len(audio):
            return None
        tail = audio[cov:]
        if len(tail) and self._frame_energy(tail) > self.threshold:
            return None
        return await task

    async def take_latest(self) -> Optional[str]:
        """Like take(), for callers whose utterance buffer excludes
        leading silence (the VoicePipeline endpointer): feed()'s
        invalidate-on-speech logic already guarantees a live task's
        snapshot is followed only by silence, and an endpointer-closed
        utterance shares that same silence run — so no prefix check is
        possible or needed."""
        task = self._task
        self.reset()
        if task is None:
            return None
        return await task


_SENTENCE_BOUNDARY = None  # compiled lazily (re import kept top-light)


def split_sentences(text: str):
    """(complete_sentences, rest): split at [.!?]+ followed by whitespace.
    Fragments shorter than 4 chars merge forward (a lone "Hi." isn't worth
    a TTS dispatch of its own)."""
    import re

    global _SENTENCE_BOUNDARY
    if _SENTENCE_BOUNDARY is None:
        _SENTENCE_BOUNDARY = re.compile(r"(?<=[.!?])\s+")
    parts = _SENTENCE_BOUNDARY.split(text)
    if not parts:
        return [], ""
    rest = parts.pop()               # no trailing terminator+space yet
    merged = []
    for p in parts:
        if merged and len(merged[-1]) < 4:
            merged[-1] = merged[-1] + " " + p
        else:
            merged.append(p)
    if merged and len(merged[-1]) < 4:
        rest = (merged.pop() + " " + rest).strip()
    return merged, rest


class VoicePipeline:
    def __init__(self, config: Optional[VoicePipelineConfig] = None,
                 stt_model=None, llm=None, tts_model=None, player=None,
                 server_state=None):
        self.config = config or VoicePipelineConfig()
        self._stt = stt_model
        self._llm = llm
        self._tts = tts_model
        self._player = player
        self._server_state = server_state
        self.vad = EnergyVAD(self.config.silence_threshold)

        self.transcription_queue: asyncio.Queue = asyncio.Queue()
        self.response_queue: asyncio.Queue = asyncio.Queue()
        self.output_audio_queue: asyncio.Queue = asyncio.Queue()
        self.cancel_event = asyncio.Event()
        self._speak_task: Optional[asyncio.Task] = None
        self._running = False
        # multi-turn conversation memory (superset of the reference, whose
        # _generate_response rebuilds system+user each turn, :200-215);
        # ChatLM evicts drop-oldest when the context budget overflows
        self._history: list = []

    # -- model access ------------------------------------------------------

    def init_models(self):
        """Load all three stages (reference init_models, :55-66)."""
        if self._stt is None:
            if self._server_state is not None:
                self._stt = self._server_state.get_stt(self.config.stt_model)
            else:
                from mlx_audio_tpu.utils.loader import load_model

                self._stt = load_model(self.config.stt_model, domain="stt")
        if self._llm is None and self.config.llm_model:
            from mlx_audio_tpu.models.lm.chat import ChatLM

            logger.info(f"Loading chat LLM {self.config.llm_model}")
            self._llm = ChatLM.from_pretrained(self.config.llm_model)
        if self._tts is None:
            if self._server_state is not None:
                self._tts = self._server_state.get_tts(self.config.tts_model)
            else:
                from mlx_audio_tpu.utils.loader import load_model

                self._tts = load_model(self.config.tts_model, domain="tts")
        return self

    def prewarm(self, max_phonemes: int = 128) -> int:
        """Compile every jitted graph a live turn can hit, before serving.

        Without this, each first-seen shape bucket (a new reply-sentence
        phoneme length, a longer chat prompt as history grows, the first
        STT window) compiles in the middle of a user's turn — the
        multi-second p95 outliers in docs/PERF.md's STS section.  Warms,
        in order: the TTS stage graphs (model.prewarm when the model
        offers one), the chat LM's prompt buckets, and one dummy STT
        window.  Returns the number of graph executions issued; safe to
        call again (cached graphs re-issue for ~free).
        """
        import time as _time

        self.init_models()
        t0 = _time.time()
        issued = 0
        tts_warm = getattr(self._tts, "prewarm", None)
        if callable(tts_warm):
            issued += tts_warm(max_phonemes=max_phonemes)
        llm_warm = getattr(self._llm, "prewarm", None)
        if callable(llm_warm):
            issued += llm_warm()
        try:
            # warm the conversational-utterance STT length buckets (the
            # >8 s tail is rare enough to take its one-off on first use)
            for secs in (0.5, 1.0, 2.0, 4.0, 8.0):
                self.transcribe(
                    np.zeros(int(secs * self.config.sample_rate),
                             dtype=np.float32))
                issued += 1
        except Exception:        # pragma: no cover - STT warm is best-effort
            logger.warning("prewarm: STT warm-up failed", exc_info=True)
        logger.info("prewarm: %d graph executions in %.1f s",
                    issued, _time.time() - t0)
        return issued

    # -- stage functions ---------------------------------------------------

    # Geometric utterance-length buckets for the STT stage.  Endpointed
    # utterances differ by one 0.15 s frame turn-to-turn, so without
    # bucketing nearly EVERY turn's raw length is first-seen — and the
    # STT mel/front-end pays a per-new-shape compile (~8 s on the
    # tunneled chip; the two residual p95 spikes in the round-5 A/B,
    # docs/PERF.md).  Rounding up with zeros is semantically the trailing
    # silence the endpointer already sends; 30 s is the Whisper window.
    STT_LEN_BUCKETS = (0.5, 1.0, 2.0, 4.0, 8.0, 16.0, 30.0)

    def _bucket_stt_audio(self, audio: np.ndarray) -> np.ndarray:
        sr = self.config.sample_rate
        secs = audio.size / sr
        for b in self.STT_LEN_BUCKETS:
            if secs <= b:
                pad = int(b * sr) - audio.size
                return np.pad(audio, (0, pad)) if pad > 0 else audio
        return audio        # > 30 s: the STT stack windows at 30 s anyway

    def transcribe(self, audio: np.ndarray) -> str:
        self.init_models()
        audio = self._bucket_stt_audio(
            np.asarray(audio, dtype=np.float32).reshape(-1))
        out = self._stt.generate(audio)
        return out.text.strip() if hasattr(out, "text") else str(out)

    def respond(self, text: str) -> str:
        """LLM response (reference _generate_response, :198-221);
        passthrough-echo when no LLM is configured or injected.  Chat-aware
        stages (ChatLM) get the running conversation history and the
        exchange is recorded; plain callables stay (text)->text."""
        self.init_models()
        if self._llm is None:
            return text
        if not callable(self._llm):
            raise ValueError("llm must be a callable(text)->text")
        import inspect

        try:
            takes_history = "history" in inspect.signature(
                self._llm).parameters
        except (TypeError, ValueError):
            takes_history = False
        if takes_history:
            reply = self._llm(text, history=self._history)
            self._history += [{"role": "user", "content": text},
                              {"role": "assistant", "content": reply}]
            # bound the stored transcript too (ChatLM evicts by token
            # budget at prompt build; this caps host memory/tokenize cost)
            del self._history[:-40]
            return reply
        return self._llm(text)

    def speak(self, text: str):
        """TTS a response; yields audio chunks, polling cancel for barge-in
        (reference _speak_response, :233-267)."""
        self.init_models()
        for result in self._tts.generate(text, voice=self.config.tts_voice,
                                         speed=self.config.tts_speed,
                                         lang_code=self.config.tts_language):
            if self.cancel_event.is_set():
                break
            yield np.asarray(result.audio).reshape(-1)

    async def process_turn(self, audio: np.ndarray,
                           text: Optional[str] = None):
        """One full STS turn (used by the websocket transport).  `text`
        short-circuits the STT stage when a SpeculativeTranscriber already
        produced the transcript during the endpoint silence window."""
        loop = asyncio.get_event_loop()
        if text is None:
            text = await loop.run_in_executor(None, self.transcribe, audio)
        if not text:
            return "", None
        response = await loop.run_in_executor(None, self.respond, text)
        chunks = await loop.run_in_executor(
            None, lambda: list(self.speak(response))
        )
        return response, (np.concatenate(chunks) if chunks else None)

    async def process_turn_streaming(self, audio: np.ndarray,
                                     text: Optional[str] = None):
        """One STS turn as an async event stream: ("transcript", text),
        then ("audio", chunk) per synthesized sentence, then
        ("done", full_response).

        When the LLM stage supports token streaming (ChatLM.respond_stream)
        the reply is cut at sentence boundaries and each sentence is
        synthesized while the LLM is still decoding the next one — the
        first audio chunk leaves after ~one sentence instead of after the
        whole reply.  Barge-in (cancel_event) aborts between chunks.
        Reference behavior being beaten: sts/voice_pipeline.py:193-267
        fully serializes STT -> LLM -> TTS."""
        loop = asyncio.get_event_loop()
        if text is None:
            text = await loop.run_in_executor(None, self.transcribe, audio)
        if not text:
            yield ("done", "")
            return
        yield ("transcript", text)

        self.init_models()
        stream_fn = getattr(self._llm, "respond_stream", None)
        if stream_fn is None:
            # non-streaming LLM (or passthrough echo): sentence-cut the
            # finished reply so playback still starts at sentence 1
            response = await loop.run_in_executor(None, self.respond, text)
            sentences, rest = split_sentences(response)
            if rest:
                sentences.append(rest)
            for sent in sentences:
                if self.cancel_event.is_set():
                    break
                chunks = await loop.run_in_executor(
                    None, lambda s=sent: list(self.speak(s)))
                for c in chunks:
                    yield ("audio", c)
            yield ("done", response)
            return

        q: asyncio.Queue = asyncio.Queue()

        def produce():
            emitted = 0
            snapshot = ""
            try:
                for snapshot in stream_fn(text, history=self._history):
                    if self.cancel_event.is_set():
                        break
                    sents, _rest = split_sentences(snapshot)
                    while emitted < len(sents):
                        # never re-emit: only append new complete sentences
                        loop.call_soon_threadsafe(
                            q.put_nowait, ("sent", sents[emitted]))
                        emitted += 1
                # flush whatever never got a terminator
                sents, rest = split_sentences(snapshot)
                tail = " ".join(sents[emitted:] + ([rest] if rest else []))
                if tail.strip() and not self.cancel_event.is_set():
                    loop.call_soon_threadsafe(q.put_nowait,
                                              ("sent", tail.strip()))
            finally:
                loop.call_soon_threadsafe(q.put_nowait, ("end", snapshot))

        producer = loop.run_in_executor(None, produce)
        response = ""
        while True:
            kind, payload = await q.get()
            if kind == "end":
                response = payload
                break
            if self.cancel_event.is_set():
                continue             # drain without synthesizing
            chunks = await loop.run_in_executor(
                None, lambda s=payload: list(self.speak(s)))
            for c in chunks:
                yield ("audio", c)
        await producer
        if response:
            self._history += [{"role": "user", "content": text},
                              {"role": "assistant", "content": response}]
            del self._history[:-40]
        yield ("done", response)

    # -- streaming endpointing --------------------------------------------

    def feed_frames(self, frames: np.ndarray):
        """Synchronous endpointer: feed audio frames, returns a completed
        utterance when the silence window closes, else None."""
        if not hasattr(self, "_utt_buffer"):
            self._utt_buffer = []
            self._silence_frames = 0
            self._in_speech = False
        frame_len = int(self.config.sample_rate * self.config.frame_duration_ms / 1000)
        # carry the trailing partial frame into the next call instead of
        # dropping it (utterance-final samples otherwise vanish)
        if getattr(self, "_frame_remainder", None) is not None and len(
            self._frame_remainder
        ):
            frames = np.concatenate([self._frame_remainder, frames])
        n_full = (len(frames) // frame_len) * frame_len
        self._frame_remainder = frames[n_full:]
        out = None
        for start in range(0, n_full, frame_len):
            frame = frames[start:start + frame_len]
            speech = self.vad.is_speech(frame)
            if speech:
                if not self._in_speech and self._speak_task is not None:
                    # barge-in: cancel current speech (reference :139-144)
                    self.cancel_event.set()
                    if self._player is not None:
                        self._player.flush()
                self._in_speech = True
                self._silence_frames = 0
                self._utt_buffer.append(frame)
            elif self._in_speech:
                self._silence_frames += 1
                self._utt_buffer.append(frame)
                silence_sec = (self._silence_frames * self.config.frame_duration_ms
                               / 1000)
                if silence_sec >= self.config.silence_duration:
                    out = np.concatenate(self._utt_buffer)
                    self._utt_buffer = []
                    self._in_speech = False
                    self._silence_frames = 0
        max_len = int(self.config.max_utterance_seconds * self.config.sample_rate)
        if self._utt_buffer and sum(len(f) for f in self._utt_buffer) > max_len:
            out = np.concatenate(self._utt_buffer)
            self._utt_buffer = []
            self._in_speech = False
        return out

    # -- async task graph (reference start/:67-106) ------------------------

    async def start(self, frame_source=None):
        """Run the pipeline: frame_source is an async iterator of numpy
        frames (microphone, websocket, file...)."""
        self._running = True
        self.init_models()
        tasks = [
            asyncio.create_task(self._listener(frame_source)),
            asyncio.create_task(self._process_audio()),
            asyncio.create_task(self._response_processor()),
            asyncio.create_task(self._audio_output_processor()),
        ]
        try:
            await asyncio.gather(*tasks)
        finally:
            self._running = False
            for t in tasks:
                t.cancel()

    async def stop(self):
        self._running = False

    async def _listener(self, frame_source):
        if frame_source is None:
            frame_source = self._microphone_frames()
        async for frames in frame_source:
            if not self._running:
                break
            utterance = self.feed_frames(np.asarray(frames))
            if utterance is not None:
                await self.transcription_queue.put(utterance)

    async def _microphone_frames(self):  # pragma: no cover - needs hardware
        import sounddevice as sd

        q: asyncio.Queue = asyncio.Queue()
        loop = asyncio.get_event_loop()
        frame_len = int(self.config.sample_rate * self.config.frame_duration_ms / 1000)

        def callback(indata, frames, time_info, status):
            loop.call_soon_threadsafe(q.put_nowait, indata[:, 0].copy())

        with sd.InputStream(samplerate=self.config.sample_rate, channels=1,
                            blocksize=frame_len, callback=callback):
            while self._running:
                yield await q.get()

    async def _process_audio(self):
        loop = asyncio.get_event_loop()
        while self._running:
            audio = await self.transcription_queue.get()
            text = await loop.run_in_executor(None, self.transcribe, audio)
            if text:
                logger.info(f"User: {text}")
                await self.response_queue.put(text)

    async def _response_processor(self):
        loop = asyncio.get_event_loop()
        while self._running:
            text = await self.response_queue.get()
            response = await loop.run_in_executor(None, self.respond, text)
            logger.info(f"Assistant: {response}")
            # retire the previous utterance BEFORE clearing the cancel flag:
            # clearing first lets a still-running speak() miss the barge-in
            # and interleave its chunks with the new response
            if self._speak_task is not None and not self._speak_task.done():
                self._speak_task.cancel()
                try:
                    await self._speak_task
                except asyncio.CancelledError:
                    pass
            self.cancel_event.clear()
            self._speak_task = asyncio.create_task(self._speak(response))

    async def _speak(self, response: str):
        loop = asyncio.get_event_loop()

        def produce():
            return list(self.speak(response))

        for chunk in await loop.run_in_executor(None, produce):
            if self.cancel_event.is_set():
                break
            await self.output_audio_queue.put(chunk)

    async def _audio_output_processor(self):
        while self._running:
            chunk = await self.output_audio_queue.get()
            if self._player is None:
                from mlx_audio_tpu.tts.audio_player import AudioPlayer

                self._player = AudioPlayer(
                    sample_rate=getattr(self._tts, "sample_rate", 24000)
                )
            self._player.queue_audio(chunk)


def main():  # pragma: no cover
    import argparse

    parser = argparse.ArgumentParser(description="Realtime STS assistant")
    parser.add_argument("--stt", default="mlx-community/whisper-large-v3-turbo")
    parser.add_argument("--tts", default="prince-canuma/Kokoro-82M")
    parser.add_argument("--voice", default="af_heart")
    parser.add_argument("--llm-model", default=None,
                        help="chat LLM checkpoint (HF llama/qwen layout); "
                             "without one, responses echo the transcript")
    args = parser.parse_args()
    cfg = VoicePipelineConfig(stt_model=args.stt, tts_model=args.tts,
                              tts_voice=args.voice, llm_model=args.llm_model)
    asyncio.run(VoicePipeline(cfg).start())


if __name__ == "__main__":
    main()
