#!/usr/bin/env python
"""Data-parallel scaling benchmark: Kokoro-82M bulk TTS over 1..N devices.

The SURVEY §2.5 north star asks for audio-sec/s at 1 chip -> 1 host ->
2 hosts with near-linear scaling.  This harness runs the same batched
synthesis graph as bench.py, data-parallel over a ('data','model') mesh of
the first d devices for each d in the sweep, and reports per-d throughput
plus scaling efficiency vs d=1.  On a single chip it degenerates to the
bench.py measurement; on a pod slice the DP axis rides ICI (and DCN across
hosts when launched under jax.distributed, one process per host).

Usage:
  python scripts/bench_scaling.py [--devices 1,2,4,8] [--batch-per-device 8]
      [--dtype bf16|f32] [--iters 10] [--cpu N]   (--cpu N: N virtual CPU
      devices, for validating the sweep without hardware)
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=str, default=None,
                    help="comma-separated device counts (default: 1..all)")
    ap.add_argument("--batch-per-device", type=int, default=8)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--frame-bucket", type=int, default=1300)
    ap.add_argument("--cpu", type=int, default=0,
                    help="force N virtual CPU devices (no TPU needed)")
    args = ap.parse_args()

    if args.cpu:
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import jax.numpy as jnp

    from mlx_audio_tpu.models.tts.kokoro.model import (
        Model,
        _duration_stage,
        _synthesis_stage,
    )
    from mlx_audio_tpu.models.tts.kokoro.presets import kokoro_82m_config
    from mlx_audio_tpu.parallel.mesh import get_mesh, replicate, shard_batch

    all_devices = jax.devices()
    if args.devices:
        counts = [int(x) for x in args.devices.split(",")]
    else:
        counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= len(all_devices)]

    dtype = jnp.float32 if args.dtype == "f32" else jnp.bfloat16
    model = Model(kokoro_82m_config()).astype(dtype)
    n_bucket, f_bucket = 512, args.frame_bucket
    rng = np.random.default_rng(0)

    def build_inputs(batch):
        input_ids = jnp.asarray(
            rng.integers(1, model.config.n_token, size=(batch, n_bucket)),
            dtype=jnp.int32,
        )
        lengths = jnp.full((batch,), n_bucket, dtype=jnp.int32)
        ref_s = jnp.asarray(rng.standard_normal((batch, 256)) * 0.1, dtype=dtype)
        speed = jnp.ones((batch,), dtype=dtype)
        return input_ids, lengths, ref_s, speed

    def run_once(m, input_ids, lengths, ref_s, speed, key, num_frames):
        d, pred_dur = _duration_stage(m, input_ids, lengths, ref_s[:, 128:], speed)
        pred_dur = jnp.minimum(pred_dur, 2)
        audio, total = _synthesis_stage(
            m, input_ids, lengths, d, pred_dur, ref_s, key, num_frames
        )
        return audio, total

    def sync(audio, total):
        # data-dependent D2H fetch: block_until_ready returns early on the
        # tunneled runtime (docs/PERF.md)
        return float(jnp.sum(jnp.abs(audio))), float(np.asarray(total).sum())

    results = []
    base = None
    for d in counts:
        mesh = get_mesh(model_parallel=1, devices=all_devices[:d])
        m = replicate(mesh, model)
        batch = args.batch_per_device * d
        inputs = shard_batch(mesh, build_inputs(batch))
        key = jax.random.PRNGKey(0)
        num_frames = jnp.zeros((f_bucket,), dtype=jnp.int32)

        for i in (1_000_001, 1_000_002):  # compile + runtime-init drain
            a, t = run_once(m, *inputs, jax.random.fold_in(key, i), num_frames)
            sync(a, t)

        per_iter, audio_per_iter = [], 0.0
        for i in range(args.iters):
            t0 = time.perf_counter()
            a, t = run_once(m, *inputs, jax.random.fold_in(key, i), num_frames)
            _, tot = sync(a, t)
            per_iter.append(time.perf_counter() - t0)
            audio_per_iter = tot * 600 / 24000

        median = sorted(per_iter)[len(per_iter) // 2]
        value = audio_per_iter / median
        if base is None:
            base = value
        results.append({
            "devices": d,
            "audio_sec_per_s": round(value, 2),
            "per_device": round(value / d, 2),
            "scaling_efficiency": round(value / (base * d), 3),
        })
        print(json.dumps(results[-1]))

    print(json.dumps({"metric": "kokoro82m_dp_scaling", "sweep": results}))


if __name__ == "__main__":
    main()
