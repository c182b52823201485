"""Mesh + sharding (SURVEY.md §2.5 TPU-native additions).

conftest forces 8 virtual CPU devices, so all mesh paths execute for real.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.nn import Linear
from mlx_audio_tpu.parallel.mesh import (
    get_mesh,
    pmap_batches,
    replicate,
    shard_batch,
    shard_module,
    tp_rules_llama,
)


def test_mesh_shapes():
    mesh = get_mesh(model_parallel=2)
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2


def test_pmap_batches_data_parallel():
    """pmap_batches shards a batch over the data axis and matches the
    single-device result."""
    lin = Linear(16, 8)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((8, 16)),
                    dtype=jnp.float32)
    ref = lin(x)
    mesh = get_mesh(model_parallel=1)
    out = pmap_batches(mesh, lambda m, a: m(a), lin, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pmap_batches_rejects_indivisible():
    mesh = get_mesh(model_parallel=1)
    lin = Linear(4, 4)
    x = jnp.zeros((6, 4))
    try:
        pmap_batches(mesh, lambda m, a: m(a), lin, x)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_shard_module_tp_matches_replicated():
    """Tensor-parallel placement must not change results — XLA inserts the
    collectives implied by the shardings."""
    from mlx_audio_tpu.models.lm.llama import LlamaConfig, LlamaModel

    cfg = LlamaConfig(
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, hidden_size=32, intermediate_size=64, rms_norm_eps=1e-5,
        vocab_size=64, max_position_embeddings=64,
    )
    model = LlamaModel(cfg)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 64, (2, 10)),
                      dtype=jnp.int32)
    ref = model(ids)
    mesh = get_mesh(model_parallel=2)
    with mesh:
        sharded = shard_module(mesh, model, tp_rules_llama)
        out = jax.jit(lambda m, t: m(t))(sharded, replicate(mesh, ids))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_csm_tp_decode_matches_replicated():
    """CSM frame decode under tensor-parallel backbone sharding must emit
    the same codes as the replicated model (greedy, temp=0)."""
    import sys

    sys.path.insert(0, "/root/repo/tests")
    from test_sesame import tiny_config as csm_tiny
    from mlx_audio_tpu.models.tts.sesame.model import (
        SesameModel,
        _prefill_and_first_frame,
    )

    sm = SesameModel(csm_tiny())
    sm = sm.tree_replace(audio_head=jnp.asarray(
        np.random.default_rng(0).standard_normal(sm.audio_head.shape) * 0.1,
        dtype=jnp.float32,
    ))
    rng = np.random.default_rng(5)
    tokens = jnp.asarray(rng.integers(0, 60, (1, 16, 5)), dtype=jnp.int32)
    mask = jnp.ones((1, 16, 5), dtype=bool)
    pad = jnp.asarray([2])
    key = jax.random.PRNGKey(0)

    caches = sm.backbone.init_cache(1, max_len=32)
    frame_ref, _ = _prefill_and_first_frame(sm, caches, pad, tokens, mask,
                                            key, 0.0, 1)

    mesh = get_mesh(model_parallel=2)
    with mesh:
        sharded = shard_module(mesh, sm, tp_rules_llama)
        caches2 = sharded.backbone.init_cache(1, max_len=32)
        frame_tp, _ = _prefill_and_first_frame(
            sharded, replicate(mesh, caches2),
            replicate(mesh, pad), replicate(mesh, tokens),
            replicate(mesh, mask), replicate(mesh, key), 0.0, 1,
        )
    np.testing.assert_array_equal(np.asarray(frame_ref), np.asarray(frame_tp))


def test_graft_entry_dryrun():
    """The driver's multichip dry-run contract must keep working."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)
