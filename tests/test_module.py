"""Tests for the pytree module system."""

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.nn.module import Module, named_arrays, update_arrays


class Leafy(Module):
    def __init__(self, dim):
        self.dim = dim
        self.weight = jnp.ones((dim, dim))
        self.bias = jnp.zeros((dim,))

    def __call__(self, x):
        return x @ self.weight + self.bias


class Nested(Module):
    def __init__(self):
        self.layers = [Leafy(4), Leafy(4)]
        self.name = "nested"
        self.scale = 2.0

    def __call__(self, x):
        for l in self.layers:
            x = l(x)
        return x * self.scale


def test_module_is_pytree():
    m = Leafy(4)
    leaves = jax.tree_util.tree_leaves(m)
    assert len(leaves) == 2
    # static config survives a tree_map round trip
    m2 = jax.tree_util.tree_map(lambda x: x * 2, m)
    assert m2.dim == 4
    np.testing.assert_allclose(np.asarray(m2.weight), 2 * np.ones((4, 4)))


def test_jit_over_module():
    m = Nested()

    @jax.jit
    def f(mod, x):
        return mod(x)

    out = f(m, jnp.ones((2, 4)))
    assert out.shape == (2, 4)
    # second call hits the cache (same treedef)
    out2 = f(m, jnp.ones((2, 4)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))


def test_named_arrays_paths():
    m = Nested()
    paths = dict(named_arrays(m))
    assert "layers.0.weight" in paths
    assert "layers.1.bias" in paths
    assert len(paths) == 4


def test_update_arrays():
    m = Nested()
    new_w = jnp.full((4, 4), 7.0)
    m2 = update_arrays(m, {"layers.0.weight": new_w})
    np.testing.assert_allclose(np.asarray(m2.layers[0].weight), 7.0 * np.ones((4, 4)))
    # original untouched
    np.testing.assert_allclose(np.asarray(m.layers[0].weight), np.ones((4, 4)))


def test_update_arrays_strict_errors():
    m = Leafy(4)
    try:
        update_arrays(m, {"nope": jnp.zeros(3)})
        assert False
    except KeyError:
        pass
    try:
        update_arrays(m, {"weight": jnp.zeros((2, 2))})
        assert False
    except ValueError:
        pass


def test_astype():
    m = Leafy(4).astype(jnp.bfloat16)
    assert m.weight.dtype == jnp.bfloat16


def test_scan_over_module_stack():
    # Stacked module weights drive a lax.scan — the pattern used for
    # repeated transformer layers.
    ms = [Leafy(4) for _ in range(3)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *ms)

    def step(x, layer):
        return layer(x), None

    out, _ = jax.lax.scan(step, jnp.ones((2, 4)), stacked)
    assert out.shape == (2, 4)
