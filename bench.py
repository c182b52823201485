#!/usr/bin/env python
"""Benchmark: Kokoro-82M bulk TTS throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's only published number — ≈3.08 audio-seconds/s
bulk Kokoro throughput on an M4 Pro (BASELINE.md; examples/bible-audiobook).
We measure steady-state generated audio-seconds per wall-second for batched
synthesis of full 510-phoneme segments (compile excluded, device-synced;
bf16/batch-32 defaults per docs/PERF.md, BENCH_DTYPE/BENCH_BATCH override).
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mlx_audio_tpu.models.tts.kokoro.model import (
        Model,
        _duration_stage,
        _synthesis_stage,
    )
    from mlx_audio_tpu.models.tts.kokoro.presets import kokoro_82m_config

    # Defaults are the measured-best stable serving config (docs/PERF.md):
    # bf16 weights+activations (f32 islands keep instance-norm stats /
    # SineGen phase / ISTFT exact — gated by test_bf16_forward_finite_and_
    # close) at batch 32.  BENCH_DTYPE=f32 / BENCH_BATCH=N override.
    dtype = jnp.float32 if os.environ.get("BENCH_DTYPE") == "f32" else jnp.bfloat16
    model = Model(kokoro_82m_config()).astype(dtype)

    batch = int(os.environ.get("BENCH_BATCH", "32"))
    n_bucket = 512
    n_valid = 512
    f_bucket = 1300  # ~full-length segments: 510 phonemes * ~2.5 frames

    rng = np.random.default_rng(0)
    input_ids = jnp.asarray(
        rng.integers(1, model.config.n_token, size=(batch, n_bucket)), dtype=jnp.int32
    )
    lengths = jnp.full((batch,), n_valid, dtype=jnp.int32)
    # float inputs follow the model dtype — mixed f32 inputs would promote
    # the whole graph back to f32 under the matmul/conv promotion rules
    ref_s = jnp.asarray(rng.standard_normal((batch, 256)) * 0.1, dtype=dtype)
    speed = jnp.ones((batch,), dtype=dtype)
    key = jax.random.PRNGKey(0)
    num_frames = jnp.zeros((f_bucket,), dtype=jnp.int32)

    # Cap synthetic durations at alternating 2/3 frames per phoneme: the
    # realistic ~2.5 frames/phoneme rate (510 phonemes -> ~1300 frames,
    # docs/PERF.md) while keeping the total deterministically inside the
    # frame bucket (512 * 2.5 = 1280 <= 1300).  A flat cap of 2 under-credits
    # the run: synthesis compute covers the full 1300-frame bucket either way,
    # but only actually-generated frames count toward audio-seconds.
    dur_caps = 2 + (jnp.arange(n_bucket, dtype=jnp.int32) % 2)[None, :]

    def run_once(key):
        d, pred_dur = _duration_stage(model, input_ids, lengths, ref_s[:, 128:], speed)
        pred_dur = jnp.minimum(pred_dur, dur_caps)
        audio, total = _synthesis_stage(
            model, input_ids, lengths, d, pred_dur, ref_s, key, num_frames
        )
        return audio, total

    def sync(audio, total):
        """True device sync: a scalar that depends on the audio output.
        (block_until_ready returns early under the tunneled TPU runtime —
        only a data-dependent D2H fetch actually drains the queue.)"""
        return float(jnp.sum(jnp.abs(audio))), float(np.asarray(total).sum())

    # warmup / compile — run the exact timed loop body twice with real
    # drains: the first call compiles and the first drained execution pays a
    # one-off ~60-80 s runtime re-initialization on this v5e setup
    for i in (1_000_001, 1_000_002):
        audio, total = run_once(jax.random.fold_in(key, i))
        sync(audio, total)

    # median per-iteration throughput: robust to transient stragglers on a
    # shared/tunneled chip (total-wall measurements varied 10x run to run)
    iters = 20
    per_iter = []
    audio_per_iter = 0.0
    for i in range(iters):
        t0 = time.perf_counter()
        audio, total = run_once(jax.random.fold_in(key, i))
        _, tot = sync(audio, total)
        per_iter.append(time.perf_counter() - t0)
        audio_per_iter = tot * 600 / 24000

    median = sorted(per_iter)[iters // 2]
    value = audio_per_iter / median
    baseline = 3.08
    print(
        json.dumps(
            {
                "metric": "kokoro82m_audio_seconds_per_second_per_chip",
                "value": round(value, 3),
                "unit": "audio-sec/s",
                "vs_baseline": round(value / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
