"""Weight-only quantization + converter roundtrips."""

import numpy as np
import jax.numpy as jnp
import pytest

from mlx_audio_tpu.nn import Embedding, Linear, Module
from mlx_audio_tpu.nn.quantize import (
    QuantizedEmbedding,
    QuantizedLinear,
    dequantize_model,
    mixed_quant_predicate_builder,
    quantize_model,
)


class TinyNet(Module):
    def __init__(self):
        self.embed = Embedding(16, 64)
        self.layers = [Linear(64, 64) for _ in range(3)]
        self.head = Linear(64, 16)
        self.odd = Linear(7, 5)  # indivisible by group size: must be skipped

    def __call__(self, idx):
        x = self.embed(idx)
        for l in self.layers:
            x = l(x)
        return self.head(x)


def test_quantized_linear_accuracy():
    lin = Linear(64, 32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 64)),
                    dtype=jnp.float32)
    ref = lin(x)
    for bits, tol in [(8, 0.02), (4, 0.3)]:
        q = QuantizedLinear.from_linear(lin, group_size=32, bits=bits)
        err = float(jnp.abs(q(x) - ref).max())
        scale = float(jnp.abs(ref).max())
        assert err < tol * max(scale, 1.0), (bits, err)
    # dequantize roundtrip reproduces the quantized forward exactly
    q8 = QuantizedLinear.from_linear(lin, group_size=32, bits=8)
    back = q8.to_linear()
    np.testing.assert_allclose(np.asarray(back(x)), np.asarray(q8(x)),
                               rtol=1e-5, atol=1e-5)


def test_int4_packing_roundtrip_and_bytes():
    """bits<=4 codes pack two per byte (concat-half layout): the packed
    module stores half the code bytes of int8 and computes identically to
    the unpacked dequant."""
    from mlx_audio_tpu.nn.quantize import _pack4, _unpack4

    rng = np.random.default_rng(3)
    q = rng.integers(0, 16, size=(8, 64), dtype=np.uint8)
    np.testing.assert_array_equal(np.asarray(_unpack4(_pack4(q))), q)

    lin = Linear(128, 64)
    q4 = QuantizedLinear.from_linear(lin, group_size=32, bits=4)
    q8 = QuantizedLinear.from_linear(lin, group_size=32, bits=8)
    assert q4.packed and not q8.packed
    assert q4.weight.shape == (64, 64)       # [O, I/2]
    assert q8.weight.shape == (64, 128)
    assert q4.in_features == q8.in_features == 128
    x = jnp.asarray(rng.standard_normal((3, 128)), dtype=jnp.float32)
    # packed forward == dequantize-then-matmul of the same codes
    np.testing.assert_allclose(np.asarray(q4(x)),
                               np.asarray(q4.to_linear()(x)),
                               rtol=1e-5, atol=1e-5)

    emb = Embedding(10, 64)
    qe = QuantizedEmbedding.from_embedding(emb, group_size=32, bits=4)
    assert qe.packed and qe.weight.shape == (10, 32) and qe.dim == 64
    idx = jnp.asarray([0, 4, 9])
    np.testing.assert_allclose(np.asarray(qe(idx)),
                               np.asarray(qe.to_embedding()(idx)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(qe(idx)), np.asarray(emb(idx)),
                               atol=0.3)


def test_quantized_embedding_matches_rows():
    emb = Embedding(10, 64)
    q = QuantizedEmbedding.from_embedding(emb, group_size=32, bits=8)
    idx = jnp.asarray([1, 3, 7])
    np.testing.assert_allclose(np.asarray(q(idx)),
                               np.asarray(emb(idx)), atol=0.02)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 64)),
                    dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(q.as_linear(x)),
                               np.asarray(emb.as_linear(x)), atol=0.2)


def test_quantize_model_structure_and_skip():
    net = TinyNet()
    quantize_model(net, group_size=32, bits=4)
    assert isinstance(net.embed, QuantizedEmbedding)
    assert all(isinstance(l, QuantizedLinear) for l in net.layers)
    assert isinstance(net.head, QuantizedLinear)
    assert isinstance(net.odd, Linear)  # 7 % 32 != 0 -> untouched
    out = net(jnp.asarray([[1, 2]]))
    assert out.shape == (1, 2, 16)
    dequantize_model(net)
    assert isinstance(net.embed, Embedding)
    assert all(isinstance(l, Linear) for l in net.layers)


def test_mixed_recipe_predicate():
    pred = mixed_quant_predicate_builder("mixed_4_6", None)
    assert pred("model.embed_tokens", None, None)["bits"] == 6
    assert pred("lm_head", None, None)["bits"] == 6
    assert pred("model.layers.0.mlp.up", None, None)["bits"] == 6
    assert pred("model.layers.1.mlp.up", None, None)["bits"] == 4


def test_convert_quantize_roundtrip(tmp_path):
    """convert -q writes a native quantized checkpoint load_model re-reads."""
    import sys
    sys.path.insert(0, str(tmp_path))  # noqa - reuse kokoro fixture pattern
    from test_kokoro import tiny_config
    from mlx_audio_tpu.models.tts.kokoro import Model
    from mlx_audio_tpu.utils.loader import load_model, save_checkpoint
    from mlx_audio_tpu.nn.module import named_arrays

    cfg = tiny_config()
    model = Model(cfg)
    quantize_model(model, group_size=16, bits=8)
    config_dict = {
        "model_type": "kokoro", "istftnet": cfg.istftnet,
        "dim_in": cfg.dim_in, "hidden_dim": cfg.hidden_dim,
        "max_conv_dim": cfg.max_conv_dim, "max_dur": cfg.max_dur,
        "multispeaker": cfg.multispeaker, "n_layer": cfg.n_layer,
        "n_mels": cfg.n_mels, "n_token": cfg.n_token,
        "style_dim": cfg.style_dim,
        "text_encoder_kernel_size": cfg.text_encoder_kernel_size,
        "plbert": cfg.plbert, "vocab": cfg.vocab, "dropout": cfg.dropout,
        "quantization": {"group_size": 16, "bits": 8},
    }
    out = save_checkpoint(model, tmp_path / "q_ckpt", config_dict)
    loaded = load_model(str(out), domain="tts")
    orig_w = dict(named_arrays(model))
    loaded_w = dict(named_arrays(loaded))
    assert set(orig_w) == set(loaded_w)
    some_scales = [k for k in orig_w if k.endswith(".scales")]
    assert some_scales, "no quantized layers survived the roundtrip"
    for k in some_scales[::5] + list(orig_w)[::17]:
        np.testing.assert_array_equal(np.asarray(orig_w[k]),
                                      np.asarray(loaded_w[k]))


def test_upload_to_hub_mocked(tmp_path, monkeypatch):
    """upload_to_hub writes a model card and pushes the folder via HfApi
    (reference tts/utils.py:279-323); network calls are mocked."""
    import sys
    import types
    from unittest import mock

    from mlx_audio_tpu.tts import convert as convert_mod

    calls = {}

    class FakeApi:
        def create_repo(self, repo_id, exist_ok=False):
            calls["create"] = (repo_id, exist_ok)

        def upload_folder(self, folder_path, repo_id, repo_type):
            calls["upload"] = (folder_path, repo_id, repo_type)

    class FakeCard:
        def __init__(self, text=""):
            self.text = text
            self.data = types.SimpleNamespace(tags=["orig"])

        @classmethod
        def load(cls, hf_path):
            return cls()

        def save(self, path):
            calls["card"] = path
            with open(path, "w") as f:
                f.write(self.text)

    fake_hub = types.SimpleNamespace(HfApi=FakeApi, ModelCard=FakeCard)
    with mock.patch.dict(sys.modules, {"huggingface_hub": fake_hub}):
        convert_mod.upload_to_hub(str(tmp_path), "me/repo", "orig/model")

    assert calls["create"] == ("me/repo", True)
    assert calls["upload"] == (str(tmp_path), "me/repo", "model")
    assert (tmp_path / "README.md").exists()
