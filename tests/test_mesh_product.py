"""Mesh-wired product paths (VERDICT round 1 #1): the distribution layer as
*behavior*, not a library.  Runs on the conftest 8-virtual-CPU-device mesh.

Contracts verified:
- `activate_mesh("dp=N[,tp=M]")` spec parsing + device tiling
- Kokoro `synthesize_batch` under dp=4 matches the unsharded run: integer
  durations bit-equal, audio to float-rounding (partitioning changes XLA
  tiling order; measured ~8e-7), repeat runs bit-identical; non-divisible
  batches pad exactly (per-row noise keys); batches actually split 1/dp
  per device
- the CLI surface (`generate_audio(--mesh)`) and `Model.generate` agree
  across dp=2 vs dp=4
- Parakeet chunked decode shards its chunk batch and matches no-mesh text
- CSM `generate` under tp=2 matches the replicated run
- the server micro-batcher coalesces concurrent requests into one
  mesh-sharded generate_batch pass
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_audio_tpu.parallel.context import (
    activate_mesh,
    active_mesh,
    deactivate_mesh,
    parse_mesh_spec,
)


@pytest.fixture(autouse=True)
def _clean_mesh():
    deactivate_mesh()
    yield
    deactivate_mesh()


def test_parse_mesh_spec():
    assert parse_mesh_spec("dp=4") == (4, 1)
    assert parse_mesh_spec("dp=4,tp=2") == (4, 2)
    assert parse_mesh_spec("tp=2") == (0, 2)
    assert parse_mesh_spec("8") == (8, 1)
    assert parse_mesh_spec("") == (1, 1)
    with pytest.raises(ValueError):
        parse_mesh_spec("pp=2")


def test_activate_mesh_tiling():
    ctx = activate_mesh("dp=4,tp=2")
    assert dict(ctx.mesh.shape) == {"data": 4, "model": 2}
    ctx = activate_mesh("tp=2")  # dp fills the remaining devices
    assert ctx.dp == 4 and ctx.tp == 2
    with pytest.raises(ValueError):
        activate_mesh("dp=16")
    deactivate_mesh()
    assert active_mesh() is None


# ---------------------------------------------------------------------------
# Kokoro DP
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def kokoro():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_kokoro import tiny_config
    from mlx_audio_tpu.models.tts.kokoro import Model

    return Model(tiny_config())


PS4 = ["hello world", "abc", "a longer third phoneme string", "def ghi"]


def test_kokoro_dp4_matches_unsharded(kokoro):
    """dp=4 vs unsharded: integer durations are bit-equal; audio matches to
    float-rounding (GSPMD partitioning changes matmul/conv tiling order —
    measured max |delta| ~8e-7 on this graph); repeat runs on the same mesh
    are bit-identical (determinism)."""
    rng = np.random.default_rng(0)
    refs = (rng.standard_normal((4, 256)) * 0.1).astype(np.float32)

    base = kokoro.synthesize_batch(PS4, refs)
    activate_mesh("dp=4")
    dp = kokoro.synthesize_batch(PS4, refs)
    dp_again = kokoro.synthesize_batch(PS4, refs)

    for (a0, d0), (a1, d1), (a2, d2) in zip(base, dp, dp_again):
        np.testing.assert_array_equal(d0, d1)
        np.testing.assert_allclose(a0, a1, atol=2e-5)
        np.testing.assert_array_equal(a1, a2)


def test_kokoro_dp_padding_is_exact(kokoro):
    """b=3 pads to 4 under dp=4; per-row noise keys keep real rows matching
    the unpadded unsharded run (durations exact, audio to float rounding)."""
    rng = np.random.default_rng(1)
    refs = (rng.standard_normal((3, 256)) * 0.1).astype(np.float32)
    ps = PS4[:3]

    base = kokoro.synthesize_batch(ps, refs)
    activate_mesh("dp=4")
    dp = kokoro.synthesize_batch(ps, refs)
    assert len(dp) == 3
    for (a0, d0), (a1, d1) in zip(base, dp):
        np.testing.assert_array_equal(d0, d1)
        np.testing.assert_allclose(a0, a1, atol=2e-5)


def test_kokoro_dp_batch_actually_splits():
    """Per-device batch splits are exact: each of the 4 data-axis devices
    holds exactly b/4 rows of a sharded batch."""
    ctx = activate_mesh("dp=4")
    x = np.zeros((8, 16), dtype=np.float32)
    placed = ctx.shard_batch(jnp.asarray(x))
    assert placed.sharding.shard_shape(placed.shape) == (2, 16)
    assert len(placed.addressable_shards) >= 4


def test_kokoro_generate_dp2_vs_dp4_identical(kokoro, tmp_path):
    """The CLI surface: multi-segment generate under a mesh routes through
    one batched DP pass; dp degree must not change the audio."""
    rng = np.random.default_rng(2)
    pack = (rng.standard_normal((510, 1, 256)) * 0.1).astype(np.float32)
    vpath = str(tmp_path / "voice.npy")
    np.save(vpath, pack)
    text = "hello there\nsecond segment\nthird one\nfourth bit"

    activate_mesh("dp=2")
    r2 = list(kokoro.generate(text, voice=vpath))
    activate_mesh("dp=4")
    r4 = list(kokoro.generate(text, voice=vpath))
    assert len(r2) == len(r4) == 4
    for a, b in zip(r2, r4):
        aa, bb = np.asarray(a.audio), np.asarray(b.audio)
        assert aa.shape == bb.shape
        np.testing.assert_allclose(aa, bb, atol=2e-5)


def test_cli_mesh_flag(kokoro, tmp_path, monkeypatch):
    """generate_audio(mesh=...) activates the mesh and synthesizes."""
    from mlx_audio_tpu.tts.generate import generate_audio

    rng = np.random.default_rng(3)
    pack = (rng.standard_normal((510, 1, 256)) * 0.1).astype(np.float32)
    vpath = str(tmp_path / "voice.npy")
    np.save(vpath, pack)
    monkeypatch.chdir(tmp_path)
    results = generate_audio(
        "hello\nworld", model=kokoro, voice=vpath, mesh="dp=4",
        verbose=False, join_audio=True, file_prefix=str(tmp_path / "out"),
    )
    assert active_mesh() is not None and active_mesh().dp == 4
    assert len(results) == 2
    assert (tmp_path / "out.wav").exists()


# ---------------------------------------------------------------------------
# Parakeet chunked DP
# ---------------------------------------------------------------------------


def test_parakeet_chunk_dp_matches_no_mesh():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_parakeet import ctc_config
    from mlx_audio_tpu.models.stt.parakeet.parakeet import BaseParakeet

    model = BaseParakeet.from_config(ctc_config())
    audio = np.random.default_rng(5).standard_normal(6 * 16000).astype(
        np.float32) * 0.1

    base = model.generate(audio, chunk_duration=2.0, overlap_duration=1.0)
    activate_mesh("dp=4")
    dp = model.generate(audio, chunk_duration=2.0, overlap_duration=1.0)
    assert dp.text == base.text


# ---------------------------------------------------------------------------
# CSM TP through the public generate path
# ---------------------------------------------------------------------------


def test_csm_generate_tp2_matches_replicated():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_sesame import FakeTokenizer, tiny_config
    from test_mimi import tiny_mimi
    from mlx_audio_tpu.models.tts.sesame.model import Model

    m = Model(tiny_config(), mimi=tiny_mimi(nq=4),
              text_tokenizer=FakeTokenizer())
    ref = np.random.default_rng(0).standard_normal(1920).astype(np.float32) * 0.1

    base = list(m.generate("hello", ref_audio=ref, ref_text="hi",
                           max_audio_length_ms=800, seed=3))
    activate_mesh("dp=4,tp=2")
    tp = list(m.generate("hello", ref_audio=ref, ref_text="hi",
                         max_audio_length_ms=800, seed=3))
    assert len(base) == len(tp)
    for a, b in zip(base, tp):
        assert np.asarray(a.audio).shape == np.asarray(b.audio).shape
        np.testing.assert_allclose(np.asarray(a.audio), np.asarray(b.audio),
                                   atol=1e-4)


# ---------------------------------------------------------------------------
# Server micro-batcher over the mesh
# ---------------------------------------------------------------------------


def test_server_batcher_runs_dp_batched_pass(kokoro, tmp_path):
    """Concurrent /tts requests coalesce into one generate_batch call that
    shards over the active mesh; every request gets a valid wav."""
    from mlx_audio_tpu.server import DynamicBatcher, ServerState

    rng = np.random.default_rng(6)
    pack = (rng.standard_normal((510, 1, 256)) * 0.1).astype(np.float32)
    vpath = str(tmp_path / "voice.npy")
    np.save(vpath, pack)

    state = ServerState(output_folder=str(tmp_path))
    state.tts_model = kokoro
    state.tts_repo = "local/kokoro"
    activate_mesh("dp=4")
    batcher = DynamicBatcher(state, max_batch=8, max_wait_ms=300.0)
    try:
        futs = [
            batcher.submit("local/kokoro", f"hello request {i}", vpath,
                           "1.0", "a")
            for i in range(4)
        ]
        results = [f.result(timeout=600) for f in futs]
    finally:
        batcher.close()
    assert batcher.last_batch_size == 4
    for r in results:
        assert r.get("status", 200) == 200, r
        assert (tmp_path / r["filename"]).stat().st_size > 0
