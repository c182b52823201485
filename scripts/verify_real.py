#!/usr/bin/env python
"""Real-checkpoint verification gates, runnable the day assets exist.

Every golden test in `tests/` runs tiny random-init configs (offline by
necessity); the BASELINE.md gates — waveform/mel allclose vs reference
output, STT WER parity, codec roundtrip fidelity — need real weights and
reference wavs.  This script is that procedure as one command: point it at
local checkpoint directories (and optionally reference outputs) and it
runs each gate it has inputs for, printing a JSON gate report.

Usage (run whichever subset you have assets for):
  python scripts/verify_real.py \
    --kokoro /ckpts/Kokoro-82M --voice /ckpts/af_heart.pt \
    [--text "..."] [--ref-wav kokoro_ref.wav] \
    --whisper /ckpts/whisper-large-v3-turbo --audio sample.wav \
    [--expected-text "ground truth transcript"] \
    --mimi /ckpts/mimi [--codec-wav sample24k.wav] \
    --csm /ckpts/csm-1b --csm-ref-audio ref.wav --csm-ref-text "..."

Gate pass criteria (BASELINE.md):
  kokoro   finite 24 kHz audio, 600 samples/frame contract; with --ref-wav:
           log-mel allclose (mean |d| < 0.1) + length match vs reference
  whisper  non-empty transcript; with --expected-text: WER <= 0.05
  mimi     5 s -> codes (1, 32, 63) -> (1, 1, 120960) contract; roundtrip
           SNR reported (> 4 dB passes with real weights)
  csm      finite audio at 12.5 frames/s, watermark verifies
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def wer(ref: str, hyp: str) -> float:
    """Word error rate (Levenshtein over words)."""
    r, h = ref.lower().split(), hyp.lower().split()
    d = np.zeros((len(r) + 1, len(h) + 1), dtype=np.int32)
    d[:, 0] = np.arange(len(r) + 1)
    d[0, :] = np.arange(len(h) + 1)
    for i in range(1, len(r) + 1):
        for j in range(1, len(h) + 1):
            d[i, j] = min(
                d[i - 1, j] + 1, d[i, j - 1] + 1,
                d[i - 1, j - 1] + (r[i - 1] != h[j - 1]),
            )
    return float(d[-1, -1]) / max(len(r), 1)


def log_mel(audio: np.ndarray, sr: int) -> np.ndarray:
    import jax.numpy as jnp

    from mlx_audio_tpu.dsp import mel_filters, stft

    spec = jnp.abs(stft(jnp.asarray(audio, dtype=jnp.float32), n_fft=1024,
                        hop_length=256, window="hann_periodic"))
    mel = spec @ mel_filters(sr, 1024, 80).T
    return np.asarray(jnp.log(jnp.maximum(mel, 1e-5)))


def gate_kokoro(args, report):
    from mlx_audio_tpu.utils.loader import load_model

    model = load_model(args.kokoro, domain="tts")
    text = args.text or "The quick brown fox jumps over the lazy dog."
    results = list(model.generate(text, voice=args.voice))
    audio = np.concatenate([np.asarray(r.audio).reshape(-1) for r in results])
    ok = bool(np.isfinite(audio).all() and audio.size % 600 == 0
              and model.sample_rate == 24000)
    row = {"pass": ok, "samples": int(audio.size),
           "segments": len(results)}
    if args.ref_wav:
        from mlx_audio_tpu.utils.audio_io import load_audio

        ref = load_audio(args.ref_wav, 24000)
        n = min(len(ref), len(audio))
        m_ref, m_hyp = log_mel(ref[:n], 24000), log_mel(audio[:n], 24000)
        mel_dev = float(np.mean(np.abs(m_ref - m_hyp)))
        row["mel_mean_abs_dev"] = round(mel_dev, 4)
        row["length_ratio"] = round(len(audio) / max(len(ref), 1), 3)
        row["pass"] = bool(row["pass"] and mel_dev < 0.1
                           and 0.97 < row["length_ratio"] < 1.03)
    report["kokoro"] = row


def gate_whisper(args, report):
    from mlx_audio_tpu.utils.loader import load_model

    model = load_model(args.whisper, domain="stt")
    out = model.generate(args.audio)
    row = {"pass": bool(out.text.strip()), "text": out.text.strip()[:200]}
    if args.expected_text:
        w = wer(args.expected_text, out.text)
        row["wer"] = round(w, 4)
        row["pass"] = bool(row["pass"] and w <= 0.05)
    report["whisper"] = row


def gate_mimi(args, report):
    import jax.numpy as jnp

    from mlx_audio_tpu.codec.mimi import Mimi

    mimi = Mimi.from_pretrained(args.mimi)
    if args.codec_wav:
        from mlx_audio_tpu.utils.audio_io import load_audio

        audio = load_audio(args.codec_wav, 24000)[: 5 * 24000]
        audio = np.pad(audio, (0, max(0, 5 * 24000 - len(audio))))
    else:
        audio = np.zeros(5 * 24000, dtype=np.float32)
    x = jnp.asarray(audio, dtype=jnp.float32)[None, None, :]
    codes = mimi.encode(x)
    recon = np.asarray(mimi.decode(codes))
    shape_ok = (tuple(codes.shape) == (1, 32, 63)
                and recon.shape == (1, 1, 120960))
    row = {"pass": bool(shape_ok), "codes_shape": list(codes.shape),
           "recon_shape": list(recon.shape)}
    if args.codec_wav:
        n = min(recon.shape[-1], len(audio))
        err = recon[0, 0, :n] - audio[:n]
        snr = 10 * np.log10(
            np.mean(audio[:n] ** 2) / (np.mean(err ** 2) + 1e-12) + 1e-12
        )
        row["roundtrip_snr_db"] = round(float(snr), 2)
        row["pass"] = bool(row["pass"] and snr > 4.0)
    report["mimi"] = row


def gate_csm(args, report):
    from mlx_audio_tpu.models.tts.sesame.watermarking import (
        CSM_1B_GH_WATERMARK,
        load_watermarker,
        verify,
    )
    from mlx_audio_tpu.utils.audio_io import load_audio
    from mlx_audio_tpu.utils.loader import load_model

    model = load_model(args.csm, domain="tts")
    ref = load_audio(args.csm_ref_audio, model.sample_rate)
    results = list(model.generate(
        args.text or "Hello from the verification gate.",
        ref_audio=ref, ref_text=args.csm_ref_text,
        max_audio_length_ms=10_000,
    ))
    audio = np.concatenate([np.asarray(r.audio).reshape(-1) for r in results])
    marked = verify(load_watermarker(), audio, model.sample_rate,
                    CSM_1B_GH_WATERMARK)
    report["csm"] = {
        "pass": bool(np.isfinite(audio).all() and audio.size > 0 and marked),
        "seconds": round(audio.size / model.sample_rate, 2),
        "watermark_verified": bool(marked),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kokoro"), ap.add_argument("--voice")
    ap.add_argument("--text"), ap.add_argument("--ref-wav")
    ap.add_argument("--whisper"), ap.add_argument("--audio")
    ap.add_argument("--expected-text")
    ap.add_argument("--mimi"), ap.add_argument("--codec-wav")
    ap.add_argument("--csm"), ap.add_argument("--csm-ref-audio")
    ap.add_argument("--csm-ref-text")
    ap.add_argument("--cpu", action="store_true",
                    help="run on the CPU backend (procedure dry-runs on "
                         "tiny random-weight checkpoints)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    report = {}
    try:
        if args.kokoro:
            gate_kokoro(args, report)
        if args.whisper and args.audio:
            gate_whisper(args, report)
        if args.mimi:
            gate_mimi(args, report)
        if args.csm and args.csm_ref_audio and args.csm_ref_text:
            gate_csm(args, report)
    except Exception as e:  # report partial results + the failure
        report["error"] = f"{type(e).__name__}: {e}"
    if not report:
        ap.error("no gates selected — pass at least one checkpoint dir")
    report["all_pass"] = all(
        v.get("pass") for k, v in report.items() if isinstance(v, dict)
    )
    print(json.dumps(report, indent=2))
    sys.exit(0 if report["all_pass"] else 1)


if __name__ == "__main__":
    main()
