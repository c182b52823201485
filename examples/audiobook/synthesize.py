#!/usr/bin/env python
"""Fault-tolerant bulk TTS client for mlx_audio_tpu.server.

Equivalent of the reference's examples/bible-audiobook/src/index.ts, with
automatic resume (skip existing outputs) instead of a hand-edited index.
Uses only the standard library so it runs anywhere the server is reachable.
"""

import argparse
import json
import os
import re
import time
import urllib.request
import uuid


def split_units(text: str, mode: str):
    """Split the book into synthesis units."""
    if mode == "line":
        units = [ln.strip() for ln in text.splitlines()]
    elif mode == "paragraph":
        units = [p.strip().replace("\n", " ") for p in re.split(r"\n\s*\n", text)]
    else:  # sentence-ish
        units = [s.strip() for s in re.split(r"(?<=[.!?])\s+", text)]
    return [u for u in units if u]


def post_form(url: str, fields: dict) -> dict:
    boundary = uuid.uuid4().hex
    body = b""
    for k, v in fields.items():
        body += (
            f"--{boundary}\r\nContent-Disposition: form-data; "
            f'name="{k}"\r\n\r\n{v}\r\n'
        ).encode()
    body += f"--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        url,
        data=body,
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
    )
    with urllib.request.urlopen(req, timeout=600) as resp:
        return json.loads(resp.read())


def slug(text: str, n: int = 32) -> str:
    s = re.sub(r"[^a-zA-Z0-9]+", "_", text)[:n].strip("_")
    return s or "unit"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="UTF-8 text file")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--url", default="http://localhost:8000")
    ap.add_argument("--model", default="prince-canuma/Kokoro-82M")
    ap.add_argument("--voice", default="af_heart")
    ap.add_argument("--speed", default="1.0")
    ap.add_argument("--language", default="a")
    ap.add_argument("--split", default="line",
                    choices=["line", "paragraph", "sentence"])
    ap.add_argument("--max-retries", type=int, default=5)
    args = ap.parse_args()

    with open(args.input, encoding="utf-8") as f:
        units = split_units(f.read(), args.split)
    os.makedirs(args.out_dir, exist_ok=True)
    manifest_path = os.path.join(args.out_dir, "manifest.jsonl")

    done = 0
    t_start = time.perf_counter()
    audio_sec_total = 0.0
    with open(manifest_path, "a", encoding="utf-8") as manifest:
        for i, text in enumerate(units):
            out_path = os.path.join(args.out_dir, f"{i:06d}_{slug(text)}.wav")
            if os.path.exists(out_path) and os.path.getsize(out_path) > 44:
                done += 1
                continue  # resume: already synthesized

            t0 = time.perf_counter()
            for attempt in range(args.max_retries):
                try:
                    result = post_form(
                        f"{args.url}/tts",
                        {
                            "text": text,
                            "model": args.model,
                            "voice": args.voice,
                            "speed": args.speed,
                            "language": args.language,
                        },
                    )
                    filename = result["filename"]
                    with urllib.request.urlopen(
                        f"{args.url}/audio/{filename}", timeout=600
                    ) as resp, open(out_path, "wb") as f:
                        f.write(resp.read())
                    break
                except Exception as e:  # noqa: BLE001 — retry any transport error
                    wait = min(2 ** attempt, 30)
                    print(f"[{i}] attempt {attempt + 1} failed: {e}; "
                          f"retrying in {wait}s")
                    time.sleep(wait)
            else:
                print(f"[{i}] giving up after {args.max_retries} attempts")
                continue

            dt = time.perf_counter() - t0
            size = os.path.getsize(out_path)
            audio_sec = max(size - 44, 0) / (24000 * 2)  # 16-bit mono 24 kHz
            audio_sec_total += audio_sec
            done += 1
            manifest.write(json.dumps({
                "index": i, "file": os.path.basename(out_path),
                "text": text, "audio_sec": round(audio_sec, 3),
                "wall_sec": round(dt, 3),
            }) + "\n")
            manifest.flush()
            rate = done / max(time.perf_counter() - t_start, 1e-9)
            eta = (len(units) - done) / max(rate, 1e-9)
            print(f"[{i + 1}/{len(units)}] {audio_sec:.1f}s audio in {dt:.1f}s "
                  f"(rtf {audio_sec / max(dt, 1e-9):.1f}x)  eta {eta / 60:.0f}m")

    wall = time.perf_counter() - t_start
    print(f"done: {done}/{len(units)} units, {audio_sec_total / 3600:.2f}h audio "
          f"in {wall / 3600:.2f}h wall")


if __name__ == "__main__":
    main()
