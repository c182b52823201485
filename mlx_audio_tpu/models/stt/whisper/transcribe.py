"""Whisper transcription driver: 30 s sliding windows with temperature
fallback, timestamp segmentation, hallucination skipping, word timestamps.

Host-side control flow, capability parity with /root/reference/mlx_audio/
stt/models/whisper/whisper.py:355-867; the per-window compute rides the
jitted graphs in api.py / decoding.py.
"""

from __future__ import annotations

import json
import sys
import warnings
from dataclasses import dataclass
from pathlib import Path
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.models.stt.whisper import api
from mlx_audio_tpu.models.stt.whisper.audio import (
    FRAMES_PER_SECOND,
    HOP_LENGTH,
    N_FRAMES,
    N_SAMPLES,
    SAMPLE_RATE,
    log_mel_spectrogram,
    pad_or_trim,
)
from mlx_audio_tpu.models.stt.whisper.decoding import DecodingOptions, DecodingResult
from mlx_audio_tpu.models.stt.whisper.model import ModelDimensions, WhisperModel
from mlx_audio_tpu.models.stt.whisper.timing import add_word_timestamps
from mlx_audio_tpu.models.stt.whisper.tokenizer import LANGUAGES, get_tokenizer
from mlx_audio_tpu.nn.module import update_arrays


def format_timestamp(seconds: float) -> str:
    assert seconds >= 0
    ms = round(seconds * 1000.0)
    hours, ms = divmod(ms, 3_600_000)
    minutes, ms = divmod(ms, 60_000)
    secs, ms = divmod(ms, 1_000)
    hours_marker = f"{hours:02d}:" if hours > 0 else ""
    return f"{hours_marker}{minutes:02d}:{secs:02d}.{ms:03d}"


def _get_end(segments: List[dict]) -> Optional[float]:
    return next(
        (w["end"] for s in reversed(segments) for w in reversed(s.get("words", []))),
        segments[-1]["end"] if segments else None,
    )


@dataclass
class STTOutput:
    text: str
    segments: Optional[List[dict]] = None
    language: Optional[str] = None


def _load_weight_files(model_path: Path) -> dict:
    """Collect weights from any supported container in ``model_path``:
    *.safetensors (MLX-community weights.safetensors or HF model.safetensors
    incl. shards, via the shared loader helper) or weights.npz."""
    try:
        from mlx_audio_tpu.utils.loader import load_weights_files

        return load_weights_files(model_path)
    except FileNotFoundError:
        f = model_path / "weights.npz"
        if f.exists():
            return dict(np.load(f))
        raise


class Model(WhisperModel):
    """Whisper with the user-facing transcription API."""

    # HF transformers WhisperConfig field names -> ModelDimensions
    # (so raw openai/whisper-* checkpoints load directly — the reference
    # requires pre-converted mlx-community repos)
    _HF_DIM_MAP = {
        "num_mel_bins": "n_mels",
        "max_source_positions": "n_audio_ctx",
        "d_model": "n_audio_state",
        "encoder_attention_heads": "n_audio_head",
        "encoder_layers": "n_audio_layer",
        "vocab_size": "n_vocab",
        "max_target_positions": "n_text_ctx",
        "decoder_attention_heads": "n_text_head",
        "decoder_layers": "n_text_layer",
    }

    @classmethod
    def from_pretrained(cls, path_or_hf_repo: str) -> "Model":
        model_path = Path(path_or_hf_repo)
        if not model_path.exists():
            from huggingface_hub import snapshot_download

            model_path = Path(snapshot_download(repo_id=path_or_hf_repo))
        with open(model_path / "config.json") as f:
            config = json.load(f)
            config.pop("quantization", None)
        if "d_model" in config:  # HF transformers layout
            for hf_k, our_k in cls._HF_DIM_MAP.items():
                if hf_k in config:
                    config[our_k] = config[hf_k]
            config["n_text_state"] = config["d_model"]
        dims = ModelDimensions(**{k: v for k, v in config.items()
                                  if k in ModelDimensions.__annotations__})
        model = cls(dims)
        weights = _load_weight_files(model_path)
        model._asset_dir = str(model_path)
        return update_arrays(model, model.sanitize(weights), strict=False)

    def _tokenizer(self, language=None, task=None):
        return get_tokenizer(
            self.is_multilingual, num_languages=self.num_languages,
            language=language, task=task,
            asset_dir=getattr(self, "_asset_dir", None),
        )

    def detect_language(self, mel, tokenizer=None):
        return api.detect_language(self, mel, tokenizer)

    def decode(self, mel, options: DecodingOptions = DecodingOptions(), **kwargs):
        tokenizer = self._tokenizer(options.language or "en", options.task)
        return api.decode(self, mel, options, tokenizer=tokenizer, **kwargs)

    def generate(
        self,
        audio: Union[str, np.ndarray],
        *,
        verbose: Optional[bool] = None,
        temperature: Union[float, Tuple[float, ...]] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
        compression_ratio_threshold: Optional[float] = 2.4,
        logprob_threshold: Optional[float] = -1.0,
        no_speech_threshold: Optional[float] = 0.6,
        condition_on_previous_text: bool = True,
        initial_prompt: Optional[str] = None,
        word_timestamps: bool = False,
        prepend_punctuations: str = "\"'“¿([{-",
        append_punctuations: str = "\"'.。,，!！?？:：”)]}、",
        clip_timestamps: Union[str, List[float]] = "0",
        hallucination_silence_threshold: Optional[float] = None,
        **decode_options,
    ) -> STTOutput:
        """Transcribe arbitrary-length audio (reference whisper.py:355-867)."""
        decode_options.pop("max_tokens", None)
        decode_options.pop("generation_stream", None)

        if isinstance(audio, str):
            from mlx_audio_tpu.utils.audio_io import load_audio

            audio = load_audio(audio, SAMPLE_RATE)

        # window size derives from the model's audio context (3000 mel
        # frames / 30 s for standard whisper; 2 mel frames per audio token)
        n_frames = 2 * self.dims.n_audio_ctx
        n_samples = n_frames * HOP_LENGTH
        mel = np.asarray(
            log_mel_spectrogram(audio, n_mels=self.dims.n_mels, padding=n_samples)
        )
        content_frames = mel.shape[-2] - n_frames
        content_duration = float(content_frames * HOP_LENGTH / SAMPLE_RATE)

        if decode_options.get("language") is None:
            if not self.is_multilingual:
                decode_options["language"] = "en"
            else:
                mel_segment = pad_or_trim(jnp.asarray(mel), n_frames, axis=-2)
                _, probs = self.detect_language(mel_segment)
                decode_options["language"] = max(probs, key=probs.get)
                if verbose is not None:
                    print(f"Detected language: "
                          f"{LANGUAGES[decode_options['language']].title()}")

        language = decode_options["language"]
        task = decode_options.get("task", "transcribe")
        tokenizer = self._tokenizer(language, task)

        if isinstance(clip_timestamps, str):
            clip_timestamps = [
                float(ts) for ts in (clip_timestamps.split(",") if clip_timestamps else [])
            ]
        seek_points = [round(ts * FRAMES_PER_SECOND) for ts in clip_timestamps]
        if len(seek_points) == 0:
            seek_points.append(0)
        if len(seek_points) % 2 == 1:
            seek_points.append(content_frames)
        else:
            seek_points[-1] = min(content_frames, seek_points[-1])
        seek_clips = list(zip(seek_points[::2], seek_points[1::2]))

        punctuation = "\"'“¿([{-\"'.。,，!！?？:：”)]}、"

        if word_timestamps and task == "translate":
            warnings.warn("Word-level timestamps on translations may not be reliable.")

        def decode_with_fallback(segment) -> DecodingResult:
            temperatures = (
                [temperature] if isinstance(temperature, (int, float)) else temperature
            )
            decode_result = None
            for t in temperatures:
                kwargs = {**decode_options}
                if t > 0:
                    kwargs.pop("beam_size", None)
                    kwargs.pop("patience", None)
                else:
                    kwargs.pop("best_of", None)
                options = DecodingOptions(**kwargs, temperature=t)
                decode_result = api.decode(self, segment, options,
                                           tokenizer=tokenizer)
                needs_fallback = False
                if (compression_ratio_threshold is not None
                        and decode_result.compression_ratio > compression_ratio_threshold):
                    needs_fallback = True
                if (logprob_threshold is not None
                        and decode_result.avg_logprob < logprob_threshold):
                    needs_fallback = True
                if (no_speech_threshold is not None
                        and decode_result.no_speech_prob > no_speech_threshold):
                    needs_fallback = False  # silence
                if not needs_fallback:
                    break
            return decode_result

        clip_idx = 0
        seek = seek_clips[clip_idx][0]
        input_stride = n_frames // self.dims.n_audio_ctx  # 2
        time_precision = input_stride * HOP_LENGTH / SAMPLE_RATE  # 0.02 s
        all_tokens: List[int] = []
        all_segments: List[dict] = []
        prompt_reset_since = 0

        if initial_prompt is not None:
            initial_prompt_tokens = tokenizer.encode(" " + initial_prompt.strip())
            all_tokens.extend(initial_prompt_tokens)
        else:
            initial_prompt_tokens = []

        def new_segment(*, start, end, tokens, result):
            tokens = list(map(int, tokens))
            text_tokens = [t for t in tokens if t < tokenizer.eot]
            return {
                "seek": seek,
                "start": start,
                "end": end,
                "text": tokenizer.decode(text_tokens),
                "tokens": tokens,
                "temperature": result.temperature,
                "avg_logprob": result.avg_logprob,
                "compression_ratio": result.compression_ratio,
                "no_speech_prob": result.no_speech_prob,
            }

        last_speech_timestamp = 0.0
        for seek_clip_start, seek_clip_end in seek_clips:
            seek = max(seek, seek_clip_start)
            while seek < seek_clip_end:
                time_offset = float(seek * HOP_LENGTH / SAMPLE_RATE)
                window_end_time = float((seek + n_frames) * HOP_LENGTH / SAMPLE_RATE)
                segment_size = min(n_frames, content_frames - seek,
                                   seek_clip_end - seek)
                mel_segment = mel[seek: seek + segment_size]
                segment_duration = segment_size * HOP_LENGTH / SAMPLE_RATE
                mel_segment = np.asarray(
                    pad_or_trim(jnp.asarray(mel_segment), n_frames, axis=-2)
                )

                decode_options["prompt"] = all_tokens[prompt_reset_since:]
                result = decode_with_fallback(jnp.asarray(mel_segment))
                tokens = np.array(result.tokens)

                if no_speech_threshold is not None:
                    should_skip = result.no_speech_prob > no_speech_threshold
                    if (logprob_threshold is not None
                            and result.avg_logprob > logprob_threshold):
                        should_skip = False
                    if should_skip:
                        seek += segment_size
                        continue

                previous_seek = seek
                current_segments = []

                def word_anomaly_score(word: dict) -> float:
                    probability = word.get("probability", 0.0)
                    duration = word["end"] - word["start"]
                    score = 0.0
                    if probability < 0.15:
                        score += 1.0
                    if duration < 0.133:
                        score += (0.133 - duration) * 15
                    if duration > 2.0:
                        score += duration - 2.0
                    return score

                def is_segment_anomaly(segment: Optional[dict]) -> bool:
                    if segment is None or not segment.get("words"):
                        return False
                    words = [w for w in segment["words"] if w["word"] not in punctuation]
                    words = words[:8]
                    score = sum(word_anomaly_score(w) for w in words)
                    return score >= 3 or score + 0.01 >= len(words)

                def next_words_segment(segments: List[dict]) -> Optional[dict]:
                    return next((s for s in segments if s.get("words")), None)

                timestamp_tokens = tokens >= tokenizer.timestamp_begin
                single_timestamp_ending = (
                    timestamp_tokens[-2:].tolist() == [False, True]
                    if len(tokens) >= 2 else False
                )

                consecutive = np.where(
                    np.logical_and(timestamp_tokens[:-1], timestamp_tokens[1:])
                )[0] + 1
                if len(consecutive) > 0:
                    slices = consecutive.tolist()
                    if single_timestamp_ending:
                        slices.append(len(tokens))
                    last_slice = 0
                    for current_slice in slices:
                        sliced_tokens = tokens[last_slice:current_slice]
                        start_pos = int(sliced_tokens[0]) - tokenizer.timestamp_begin
                        end_pos = int(sliced_tokens[-1]) - tokenizer.timestamp_begin
                        current_segments.append(
                            new_segment(
                                start=time_offset + start_pos * time_precision,
                                end=time_offset + end_pos * time_precision,
                                tokens=sliced_tokens,
                                result=result,
                            )
                        )
                        last_slice = current_slice
                    if single_timestamp_ending:
                        seek += segment_size
                    else:
                        last_ts_pos = int(tokens[last_slice - 1]) - tokenizer.timestamp_begin
                        seek += last_ts_pos * input_stride
                else:
                    duration = segment_duration
                    timestamps = tokens[timestamp_tokens.nonzero()[0]]
                    if (len(timestamps) > 0
                            and int(timestamps[-1]) != tokenizer.timestamp_begin):
                        last_ts_pos = int(timestamps[-1]) - tokenizer.timestamp_begin
                        duration = last_ts_pos * time_precision
                    current_segments.append(
                        new_segment(
                            start=time_offset,
                            end=time_offset + duration,
                            tokens=tokens,
                            result=result,
                        )
                    )
                    seek += segment_size

                if word_timestamps:
                    add_word_timestamps(
                        segments=current_segments,
                        model=self,
                        tokenizer=tokenizer,
                        mel=mel_segment,
                        num_frames=segment_size,
                        prepend_punctuations=prepend_punctuations,
                        append_punctuations=append_punctuations,
                        last_speech_timestamp=last_speech_timestamp,
                    )
                    if not single_timestamp_ending:
                        last_word_end = _get_end(current_segments)
                        if last_word_end is not None and last_word_end > time_offset:
                            seek = round(last_word_end * FRAMES_PER_SECOND)

                    if hallucination_silence_threshold is not None:
                        threshold = hallucination_silence_threshold
                        if not single_timestamp_ending:
                            last_word_end = _get_end(current_segments)
                            if last_word_end is not None and last_word_end > time_offset:
                                remaining = window_end_time - last_word_end
                                if remaining > threshold:
                                    seek = round(last_word_end * FRAMES_PER_SECOND)
                                else:
                                    seek = previous_seek + segment_size

                        first_segment = next_words_segment(current_segments)
                        if first_segment is not None and is_segment_anomaly(first_segment):
                            gap = first_segment["start"] - time_offset
                            if gap > threshold:
                                seek = previous_seek + round(gap * FRAMES_PER_SECOND)
                                continue

                        hal_last_end = last_speech_timestamp
                        for si in range(len(current_segments)):
                            segment = current_segments[si]
                            if not segment.get("words"):
                                continue
                            if is_segment_anomaly(segment):
                                next_segment = next_words_segment(
                                    current_segments[si + 1:]
                                )
                                if next_segment is not None:
                                    hal_next_start = next_segment["words"][0]["start"]
                                else:
                                    hal_next_start = time_offset + segment_duration
                                silence_before = (
                                    segment["start"] - hal_last_end > threshold
                                    or segment["start"] < threshold
                                    or segment["start"] - time_offset < 2.0
                                )
                                silence_after = (
                                    hal_next_start - segment["end"] > threshold
                                    or is_segment_anomaly(next_segment)
                                    or window_end_time - segment["end"] < 2.0
                                )
                                if silence_before and silence_after:
                                    seek = round(
                                        max(time_offset + 1, segment["start"])
                                        * FRAMES_PER_SECOND
                                    )
                                    if content_duration - segment["end"] < threshold:
                                        seek = content_frames
                                    current_segments[si:] = []
                                    break
                            hal_last_end = segment["end"]

                    last_word_end = _get_end(current_segments)
                    if last_word_end is not None:
                        last_speech_timestamp = last_word_end

                if verbose:
                    for segment in current_segments:
                        print(
                            f"[{format_timestamp(segment['start'])} --> "
                            f"{format_timestamp(segment['end'])}] {segment['text']}"
                        )

                for segment in current_segments:
                    if segment["start"] == segment["end"] or segment["text"].strip() == "":
                        segment["text"] = ""
                        segment["tokens"] = []
                        segment["words"] = []

                all_segments.extend(
                    {"id": i, **segment}
                    for i, segment in enumerate(current_segments,
                                                start=len(all_segments))
                )
                all_tokens.extend(
                    t for segment in current_segments for t in segment["tokens"]
                )
                if not condition_on_previous_text or result.temperature > 0.5:
                    prompt_reset_since = len(all_tokens)

        return STTOutput(
            text=tokenizer.decode(all_tokens[len(initial_prompt_tokens):]),
            segments=all_segments,
            language=language,
        )
