"""On-device export artifacts (mlx_audio_tpu/export.py): the serialized
program must reproduce the live model bit-for-bit and load without model
code (the TPU analogue of the reference's Swift on-device port,
mlx_audio_swift/)."""

import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent))


def test_kokoro_export_roundtrip(tmp_path):
    from test_kokoro import tiny_config
    from mlx_audio_tpu.export import (
        export_kokoro,
        kokoro_synthesis_fn,
        load_program,
    )
    from mlx_audio_tpu.models.tts.kokoro import Model

    model = Model(tiny_config())
    inner = getattr(model, "model", model)
    p_bucket, f_bucket = 64, 100
    path = tmp_path / "kokoro.jaxexp"
    n = export_kokoro(inner, path, batch=2, phoneme_bucket=p_bucket,
                      frame_bucket=f_bucket, platforms=("cpu",))
    assert n > 1000 and path.stat().st_size == n

    ids = np.zeros((2, p_bucket), np.int32)
    ids[0, :5] = [0, 4, 9, 2, 0]
    ids[1, :8] = [0, 7, 7, 3, 5, 1, 2, 0]
    args = (
        jnp.asarray(ids),
        jnp.asarray([5, 8], jnp.int32),
        jnp.asarray(np.random.default_rng(0)
                    .standard_normal((2, 256)).astype(np.float32) * 0.1),
        jnp.ones((2,), jnp.float32),
        jax.random.PRNGKey(3),
    )
    live_audio, live_dur = jax.jit(
        kokoro_synthesis_fn(inner, f_bucket))(*args)

    synth = load_program(path)
    got_audio, got_dur = synth(*args)
    np.testing.assert_array_equal(np.asarray(got_dur), np.asarray(live_dur))
    np.testing.assert_allclose(np.asarray(got_audio),
                               np.asarray(live_audio), rtol=1e-5, atol=1e-5)


def test_mimi_export_roundtrip(tmp_path):
    from test_mimi import tiny_mimi
    from mlx_audio_tpu.export import export_mimi_decode, load_program

    mimi = tiny_mimi(nq=4)
    path = tmp_path / "mimi.jaxexp"
    export_mimi_decode(mimi, path, batch=1, frames=7, platforms=("cpu",))

    codes = jnp.asarray(
        np.random.default_rng(1).integers(0, 17, size=(1, 4, 7)),
        jnp.int32)
    live = np.asarray(mimi.decode(codes))
    got = np.asarray(load_program(path)(codes))
    np.testing.assert_allclose(got, live, rtol=1e-5, atol=1e-5)


def test_export_artifact_needs_no_model_code(tmp_path):
    """Deserialization + call must not import mlx_audio_tpu model modules
    (checked in a clean subprocess)."""
    import subprocess

    from test_kokoro import tiny_config
    from mlx_audio_tpu.export import export_kokoro
    from mlx_audio_tpu.models.tts.kokoro import Model

    model = Model(tiny_config())
    inner = getattr(model, "model", model)
    path = tmp_path / "k.jaxexp"
    export_kokoro(inner, path, batch=1, phoneme_bucket=16, frame_bucket=100,
                  platforms=("cpu",))
    script = f"""
import sys
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from jax import export
exp = export.deserialize(open(r"{path}", "rb").read())
out = exp.call(jnp.zeros((1, 16), jnp.int32), jnp.ones((1,), jnp.int32),
               jnp.zeros((1, 256), jnp.float32), jnp.ones((1,), jnp.float32),
               jax.random.PRNGKey(0))
assert out[0].shape[0] == 1
assert not any(m.startswith("mlx_audio_tpu") for m in sys.modules), \\
    [m for m in sys.modules if m.startswith("mlx_audio_tpu")]
print("ok", out[0].shape)
"""
    r = subprocess.run([sys.executable, "-c", script], capture_output=True,
                       text=True, timeout=300,
                       env={"PATH": "/usr/bin:/bin:/usr/local/bin",
                            "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ok" in r.stdout


def test_csm_session_export_roundtrip(tmp_path):
    """Exported prefill/chunk programs must emit the exact frames of the
    live jitted loop (greedy), with caches crossing as flat arrays."""
    import json

    from test_sesame import tiny_config
    from mlx_audio_tpu.export import (
        _flat_caches,
        csm_session_fns,
        export_csm_session,
        load_program,
    )
    from mlx_audio_tpu.models.tts.sesame.model import Model

    m = Model(tiny_config())
    lm = m.model
    info = export_csm_session(lm, str(tmp_path / "csm"), prompt_bucket=16,
                              max_frames=8, chunk_frames=3, temp=0.0,
                              platforms=("cpu",))
    meta = json.load(open(tmp_path / "csm.meta.json"))
    assert meta["cache_shapes"] and meta["audio_num_codebooks"] == 4

    nc = meta["audio_num_codebooks"]
    rng = np.random.default_rng(0)
    tokens = np.zeros((1, 16, nc + 1), np.int32)
    mask = np.zeros((1, 16, nc + 1), bool)
    tokens[0, :6, -1] = rng.integers(3, 100, size=6)
    mask[0, :6, -1] = True
    pad_len = jnp.zeros((1,), jnp.int32)
    key = jax.random.PRNGKey(9)

    def init_flat():
        return [jnp.zeros(s, dtype=d) for s, d in
                zip(meta["cache_shapes"], meta["cache_dtypes"])]

    # live reference (same closures, unexported)
    prefill, chunk = csm_session_fns(lm, temp=0.0, top_k=50)
    ref_pre = jax.jit(prefill)(jnp.asarray(tokens), jnp.asarray(mask),
                               pad_len, key, *init_flat())
    import functools
    ref_ch = jax.jit(functools.partial(chunk, n=3))(
        ref_pre[0], pad_len, key, *ref_pre[1:])

    got_pre = load_program(tmp_path / "csm.prefill")(
        jnp.asarray(tokens), jnp.asarray(mask), pad_len, key, *init_flat())
    got_ch = load_program(tmp_path / "csm.chunk")(
        got_pre[0], pad_len, key, *got_pre[1:])

    np.testing.assert_array_equal(np.asarray(got_pre[0]),
                                  np.asarray(ref_pre[0]))
    np.testing.assert_array_equal(np.asarray(got_ch[0]),
                                  np.asarray(ref_ch[0]))
