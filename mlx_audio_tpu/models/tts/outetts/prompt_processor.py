"""OuteTTS prompt construction + audio-token extraction (reference
prompt_processor.py:9-181)."""

from __future__ import annotations

import re
from typing import Union

from mlx_audio_tpu.models.tts.outetts.tokens import SpecialTokens


class PromptProcessor:
    def __init__(self, tokenizer):
        self.special_tokens = SpecialTokens()
        self.tokenizer = tokenizer
        self.c1 = {}
        self.c2 = {}
        if tokenizer is not None:
            self.get_audio_token_map()
        self.input_prompt = "{bos}\n{text_start}{text}{text_end}\n{audio_start}\n"
        self.global_features = "{fs}{codes}{fe}\n"

    def get_audio_token_map(self):
        self.c1 = {
            self.tokenizer.encode(
                self.special_tokens.c1.format(i), add_special_tokens=False
            )[0]: i
            for i in range(1025)
        }
        self.c2 = {
            self.tokenizer.encode(
                self.special_tokens.c2.format(i), add_special_tokens=False
            )[0]: i
            for i in range(1025)
        }

    def get_features(self, f: dict):
        features = {
            "energy": f.get("energy", 0),
            "spectral_centroid": f.get("spectral_centroid", 0),
            "pitch": f.get("pitch", 0),
        }
        return [f"<|{k}_{v}|>" for k, v in features.items()]

    def get_global_features(self, f: dict):
        return self.global_features.format(
            fs=self.special_tokens.global_features_start,
            codes="".join(self.get_features(f)),
            fe=self.special_tokens.global_features_end,
        )

    def create_codes(self, words):
        codes = []
        for i in words:
            word = (
                i["word"]
                + self.special_tokens.features
                + self.special_tokens.time.format(i["duration"])
            )
            word += "".join(self.get_features(i["features"]))
            pairs = []
            for idx in range(len(i["c1"])):
                c1 = self.special_tokens.c1.format(i["c1"][idx])
                c2 = self.special_tokens.c2.format(i["c2"][idx])
                pairs.append(f"{c1}{c2}")
            word += self.special_tokens.code + "".join(pairs)
            codes.append(
                self.special_tokens.word_start + word + self.special_tokens.word_end
            )
        return "\n".join(codes)

    def _init_prompt(self, text):
        return self.input_prompt.format(
            bos=self.special_tokens.bos,
            text_start=self.special_tokens.text_start,
            text=text,
            text_end=self.special_tokens.text_end,
            audio_start=self.special_tokens.audio_start,
        )

    def _get_separator(self, text: str) -> str:
        has_cjk = any(
            "぀" <= c <= "ヿ" or "一" <= c <= "鿿" for c in text
        )
        return "。" if has_cjk else ". "

    def merge_speaker_text(self, input_text: str, speaker_text: str):
        speaker_text = speaker_text.strip()
        separator = self._get_separator(speaker_text)
        allowed_ends = (
            ["。", "？", "！", "?", "!"] if separator == "。" else [".", "?", "!"]
        )
        rs = ""
        if speaker_text:
            if speaker_text[-1] not in allowed_ends:
                rs = separator
            elif separator != "。":
                rs = " "
        return speaker_text.strip() + rs + input_text.strip(), rs.strip()

    @staticmethod
    def text_normalizations(text: str) -> str:
        text = re.sub(r"\s+", " ", text)
        text = text.replace("…", "...")
        text = text.strip()
        text = re.sub(r"[“”]", '"', text)
        text = re.sub(r"[‘’]", "'", text)
        text = re.sub(r"[–—]", "-", text)
        text = re.sub(r"[\x00-\x1F\x7F-\x9F]", "", text)
        return text

    def get_completion_prompt(self, text: str, speaker: dict = None) -> str:
        text = self.text_normalizations(text)
        if speaker is not None:
            text, separator = self.merge_speaker_text(text, speaker["text"])
            # do not mutate the caller's speaker dict: generate() calls this
            # per chunk (and generate_batch shares one speaker across rows),
            # so in-place `+= separator` would accumulate punctuation
            words = [dict(w) for w in speaker["words"]]
            words[-1]["word"] = words[-1]["word"] + separator
            codes = self.create_codes(words)
        prompt = self._init_prompt(text)
        if speaker is not None:
            prompt += codes + "\n" + self.special_tokens.word_start
        return prompt

    def extract_audio_from_tokens(self, tokens) -> list:
        codebook1 = [self.c1[i] for i in tokens if i in self.c1]
        codebook2 = [self.c2[i] for i in tokens if i in self.c2]
        t = min(len(codebook1), len(codebook2))
        return [codebook1[:t], codebook2[:t]]
