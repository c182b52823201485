"""OuteTTS tests: prompt construction, token extraction, end-to-end tiny
generation with a synthetic tokenizer."""

import numpy as np
import pytest

from mlx_audio_tpu.models.tts.outetts import Model, ModelConfig, PromptProcessor
from mlx_audio_tpu.models.tts.outetts.audio_processor import (
    AudioProcessor,
    calculate_pitch,
    process_audio_array,
)


class FakeTokenizer:
    """Byte-level tokenizer with c1_/c2_ code tokens mapped to dedicated ids."""

    BASE = 256

    def encode(self, text, add_special_tokens=False):
        import re

        ids = []
        pos = 0
        for m in re.finditer(r"<\|c([12])_(\d+)\|>", text):
            for ch in text[pos:m.start()].encode()[:50]:
                ids.append(ch)
            cb, val = int(m.group(1)), int(m.group(2))
            ids.append(self.BASE + (cb - 1) * 1025 + val)
            pos = m.end()
        for ch in text[pos:].encode()[:200]:
            ids.append(ch)
        return ids


def tiny_model():
    from test_dac_snac import small_dac
    from mlx_audio_tpu.codec.dac import DAC, DACConfig

    dac = DAC(DACConfig(
        encoder_dim=16, encoder_rates=[2, 4, 5, 8], decoder_dim=64,
        decoder_rates=[8, 5, 4, 2], n_codebooks=2, codebook_size=1024,
        codebook_dim=8, sample_rate=24000,
    ))
    cfg = ModelConfig(
        model_type="llama", hidden_size=64, num_hidden_layers=2,
        intermediate_size=128, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, vocab_size=256 + 2 * 1025 + 16,
        max_position_embeddings=2048,
    )
    return Model(cfg, dac_model=dac, tokenizer=FakeTokenizer())


def test_prompt_has_speaker_codes():
    pp = PromptProcessor(FakeTokenizer())
    speaker = {
        "text": "hello there",
        "words": [
            {"word": "hello", "duration": 0.5, "c1": [1, 2], "c2": [3, 4],
             "features": {"energy": 50, "spectral_centroid": 40, "pitch": 30}},
        ],
        "global_features": {"energy": 50, "spectral_centroid": 40, "pitch": 30},
    }
    prompt = pp.get_completion_prompt("good morning", speaker)
    assert "<|word_start|>" in prompt
    assert "<|c1_1|>" in prompt and "<|c2_4|>" in prompt
    assert "good morning" in prompt


def test_extract_audio_tokens_roundtrip():
    pp = PromptProcessor(FakeTokenizer())
    text = "<|c1_5|><|c2_7|><|c1_9|><|c2_11|>"
    ids = FakeTokenizer().encode(text)
    codes = pp.extract_audio_from_tokens(ids)
    assert codes == [[5, 9], [7, 11]]


def test_chunk_text():
    m = tiny_model()
    text = " ".join(["word"] * 100) + ". " + " ".join(["more"] * 10) + "."
    # single over-long sentences stay whole (reference outetts.py:88-104);
    # flushing happens between sentences
    chunks = m.chunk_text(text, max_words=30)
    assert len(chunks) == 2
    assert len(chunks[0].split()) == 100
    assert len(chunks[1].split()) == 10


def test_generate_end_to_end():
    m = tiny_model()
    results = list(m.generate("hi there", voice=None, max_tokens=64,
                              temperature=0.6, seed=0))
    # random model may or may not emit valid code pairs; if it does the
    # audio must be finite
    for r in results:
        assert np.isfinite(r.audio).all()
        assert r.sample_rate == 24000


def test_speaker_from_dict_and_features():
    ap = AudioProcessor(tiny_model()._dac_model)
    audio = (np.sin(np.linspace(0, 300, 24000)) * 0.3).astype(np.float32)
    speaker = ap.create_speaker_from_dict({
        "audio": {"bytes": audio.reshape(1, 1, -1)},
        "text": "one two",
        "words": [
            {"word": "one", "start": 0.0, "end": 0.5},
            {"word": "two", "start": 0.5, "end": 1.0},
        ],
    })
    assert len(speaker["words"]) == 2
    for w in speaker["words"]:
        assert len(w["c1"]) == len(w["c2"])
        assert 0 <= w["features"]["pitch"] <= 100


def test_pitch_detects_tone():
    sr = 24000
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * 220 * t).astype(np.float32)
    pitch = calculate_pitch(tone, sr)
    voiced = pitch[pitch > 0]
    assert len(voiced) > 0
    assert abs(np.median(voiced) - 220) < 20


def test_loudness_normalization():
    quiet = np.ones(24000, dtype=np.float32) * 0.001
    out = process_audio_array(quiet, 24000, target_loudness=-18.0)
    rms_db = 20 * np.log10(np.sqrt((out ** 2).mean()))
    assert -24 < rms_db < -12


def test_generate_batch_end_to_end():
    m = tiny_model()
    results = m.generate_batch(["hi there", "another line"], voice=None,
                               max_tokens=64, temperature=0.6, seed=0)
    assert isinstance(results, list)
    for r in results:
        assert np.isfinite(r.audio).all()
        assert r.sample_rate == 24000
