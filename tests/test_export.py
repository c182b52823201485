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


def _init_state_from_meta(meta):
    out = []
    for s, d, v in zip(meta["state_shapes"], meta["state_dtypes"],
                       meta["state_init"]):
        if v == "zeros":
            out.append(jnp.zeros(s, dtype=d))
        else:
            out.append(jnp.asarray(v, dtype=d).reshape(s))
    return out


def test_mimi_stream_export_seamless(tmp_path):
    """Chunked decode through the exported STATEFUL program must equal the
    batch decode of the same codes (the MimiStreamingDecoder guarantee,
    reference mimi.py:264-306) — no seams, no O(n^2) re-decode."""
    import json

    from test_mimi import tiny_mimi
    from mlx_audio_tpu.export import export_mimi_stream_decode, load_program

    mimi = tiny_mimi(nq=4)
    path = tmp_path / "mimi_stream.jaxexp"
    info = export_mimi_stream_decode(mimi, path, batch=1, chunk_frames=3,
                                     platforms=("cpu",))
    assert info["bytes"] > 1000
    meta = json.load(open(f"{path}.meta.json"))

    codes = jnp.asarray(
        np.random.default_rng(2).integers(0, 17, size=(1, 4, 9)), jnp.int32)
    batch_audio = np.asarray(mimi.decode(codes))

    step = load_program(path)
    state = _init_state_from_meta(meta)
    chunks = []
    for i in range(3):
        out = step(codes[:, :, 3 * i: 3 * i + 3], *state)
        chunks.append(np.asarray(out[0]))
        state = list(out[1:])
    stream_audio = np.concatenate(chunks, axis=-1)
    assert stream_audio.shape == batch_audio.shape
    np.testing.assert_allclose(stream_audio, batch_audio, atol=1e-4)


def test_causal_session_export_roundtrip(tmp_path):
    """Exported causal-LM prefill/chunk programs reproduce the live greedy
    loop (the Orpheus/OuteTTS/Spark decode engine)."""
    import json

    from mlx_audio_tpu.export import export_causal_session, load_program
    from mlx_audio_tpu.models.lm.causal import (
        LlamaForCausalLM,
        generate_tokens_batch,
    )
    from mlx_audio_tpu.models.lm.llama import LlamaConfig

    cfg = LlamaConfig(
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        head_dim=8, hidden_size=16, intermediate_size=32, rms_norm_eps=1e-5,
        vocab_size=64, max_position_embeddings=256, tie_word_embeddings=True,
    )
    lm = LlamaForCausalLM(cfg)
    info = export_causal_session(lm, str(tmp_path / "lm"), prompt_bucket=16,
                                 max_tokens=8, chunk_tokens=4, temp=0.0,
                                 platforms=("cpu",))
    meta = json.load(open(tmp_path / "lm.meta.json"))
    assert meta["chunk_tokens"] == 4

    prompt_ids = np.arange(5)
    live = generate_tokens_batch(lm, [prompt_ids], max_tokens=9,
                                 temperature=0.0, chunk=4)[0]

    prompt = np.zeros((1, 16), np.int32)
    prompt[0, 16 - 5:] = prompt_ids
    pad_len = jnp.asarray([11], jnp.int32)
    key = jax.random.PRNGKey(0)
    flat = [jnp.zeros(s, dtype=d) for s, d in
            zip(meta["cache_shapes"], meta["cache_dtypes"])]
    pre = load_program(tmp_path / "lm.prefill")(
        jnp.asarray(prompt), pad_len, key, *flat)
    toks = [int(np.asarray(pre[0])[0])]
    last, flat = pre[0], list(pre[1:])
    for _ in range(2):
        out = load_program(tmp_path / "lm.chunk")(last, pad_len, key, *flat)
        toks.extend(int(t) for t in np.asarray(out[0])[:, 0])
        last, flat = out[0][-1], list(out[1:])
    assert toks[: len(live)] == live.tolist()


def test_orpheus_export_set(tmp_path):
    """export_orpheus writes the LM session + SNAC program + the frame
    constants the host parser needs."""
    import json

    from test_orpheus import tiny_model
    from mlx_audio_tpu.export import export_orpheus, load_program

    m = tiny_model()
    info = export_orpheus(m, str(tmp_path / "orp"), prompt_bucket=16,
                          max_tokens=8, chunk_tokens=4, snac_frames=8,
                          platforms=("cpu",))
    meta = json.load(open(tmp_path / "orp.meta.json"))
    assert meta["codes_per_frame"] == 7 and meta["stop_token"] > 0
    assert info["snac_bytes"] > 1000

    # SNAC program: 3 strided code streams -> waveform
    snac = load_program(tmp_path / "orp.snac")
    audio = snac(jnp.zeros((1, 2), jnp.int32), jnp.zeros((1, 4), jnp.int32),
                 jnp.zeros((1, 8), jnp.int32))
    assert np.asarray(audio).ndim == 3


def test_whisper_greedy_export_roundtrip(tmp_path):
    """The exported greedy window program reproduces api.decode's greedy
    tokens for the same mel."""
    import json

    from test_whisper import tiny_dims, tiny_encoding
    from mlx_audio_tpu.export import export_whisper_greedy, load_program
    from mlx_audio_tpu.models.stt.whisper import api, transcribe as T
    from mlx_audio_tpu.models.stt.whisper.decoding import DecodingOptions
    from mlx_audio_tpu.models.stt.whisper.tokenizer import Tokenizer

    tok = Tokenizer(encoding=tiny_encoding(), num_languages=4,
                    language="en", task="transcribe")
    m = T.Model(tiny_dims(tok))
    m._tokenizer = lambda language=None, task=None: tok

    path = tmp_path / "whisper.jaxexp"
    info = export_whisper_greedy(m, path, batch=2, sample_len=8,
                                 platforms=("cpu",))
    meta = json.load(open(f"{path}.meta.json"))
    sb = meta["finalize"]["sample_begin"]

    mel = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 200, 80)) * 0.1,
        jnp.float32)
    live = api.decode(m, mel, DecodingOptions(language="en", sample_len=8,
                                              temperature=0.0),
                      tokenizer=tok)

    toks, t_end, sum_lp, ns = load_program(path)(mel)
    toks = np.asarray(toks)
    for i, r in enumerate(live):
        seq = toks[i, sb: int(t_end)].tolist()
        if meta["finalize"]["eot"] in seq:
            seq = seq[: seq.index(meta["finalize"]["eot"])]
        assert seq == r.tokens


def test_causal_session_sampled_key_contract(tmp_path):
    """temp>0 sessions: the meta records the fresh-key-per-call contract,
    and two chunk calls from the same state with DISTINCT keys must draw
    different continuations while the same key replays identically
    (ADVICE r3: a host reusing one key loops the per-step schedule)."""
    import json

    from mlx_audio_tpu.export import export_causal_session, load_program
    from mlx_audio_tpu.models.lm.causal import LlamaForCausalLM
    from mlx_audio_tpu.models.lm.llama import LlamaConfig

    cfg = LlamaConfig(
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        head_dim=8, hidden_size=16, intermediate_size=32, rms_norm_eps=1e-5,
        vocab_size=64, max_position_embeddings=256, tie_word_embeddings=True,
    )
    lm = LlamaForCausalLM(cfg)
    # temp high enough to flatten the tiny random-init model's peaked
    # logits — the test needs the draw to actually depend on the key
    export_causal_session(lm, str(tmp_path / "lm"), prompt_bucket=16,
                          max_tokens=32, chunk_tokens=16, temp=4.0,
                          platforms=("cpu",))
    meta = json.load(open(tmp_path / "lm.meta.json"))
    assert "fold_in" in meta["rng"]

    prompt = np.zeros((1, 16), np.int32)
    prompt[0, 11:] = np.arange(5)
    pad_len = jnp.asarray([11], jnp.int32)
    session_key = jax.random.PRNGKey(7)
    flat = [jnp.zeros(s, dtype=d) for s, d in
            zip(meta["cache_shapes"], meta["cache_dtypes"])]
    pre = load_program(tmp_path / "lm.prefill")(
        jnp.asarray(prompt), pad_len, jax.random.fold_in(session_key, 0),
        *flat)
    last, flat = pre[0], list(pre[1:])

    chunk = load_program(tmp_path / "lm.chunk")
    k1 = jax.random.fold_in(session_key, 1)
    k2 = jax.random.fold_in(session_key, 2)
    out_same = np.asarray(chunk(last, pad_len, k1, *flat)[0])
    out_same2 = np.asarray(chunk(last, pad_len, k1, *flat)[0])
    out_fresh = np.asarray(chunk(last, pad_len, k2, *flat)[0])
    np.testing.assert_array_equal(out_same, out_same2)
    assert (out_same != out_fresh).any()
