"""Pytree-native module system for the TPU build.

Design goals (TPU-first, unlike the reference's mlx.nn.Module):

* A ``Module`` *is* a JAX pytree: its array-valued attributes (and nested
  modules / containers of them) are pytree leaves, everything else is static
  metadata baked into the treedef.  This means any module can be passed
  straight through ``jax.jit`` / ``lax.scan`` / ``shard_map`` / ``pjit`` with
  no parameter-dict plumbing, and sharding annotations apply per-leaf.
* Modules are plain Python objects with ordinary ``__init__`` constructors
  (torch/MLX-like ergonomics) but are treated as immutable after
  construction; "mutation" for functional updates goes through
  :func:`update_arrays` / ``jax.tree_util`` transforms.
* Weight loading is path-based: :func:`named_arrays` yields dotted paths that
  mirror attribute access, so safetensors key-mapping (the reference's
  ``sanitize`` functions, e.g. /root/reference/mlx_audio/tts/utils.py:239)
  becomes a pure path->path rename table.
"""

from __future__ import annotations

from typing import Any, Callable, Iterator

import jax
import numpy as np
from jax import tree_util


def _is_dynamic(v: Any) -> bool:
    """True if a value belongs on the pytree-leaf (traced) side."""
    if isinstance(v, (jax.Array, np.ndarray, Module)):
        return True
    if isinstance(v, (list, tuple)):
        return any(_is_dynamic(x) for x in v)
    if isinstance(v, dict):
        return any(_is_dynamic(x) for x in v.values())
    return False


def _freeze(v: Any) -> Any:
    """Recursively convert a static value to a hashable representation."""
    if isinstance(v, (list, tuple)):
        return tuple(_freeze(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _freeze(x)) for k, x in v.items()))
    if isinstance(v, set):
        return frozenset(_freeze(x) for x in v)
    if isinstance(v, np.dtype):
        return str(v)
    return v


class _Static:
    """Hashable wrapper for a module's static attributes (treedef aux data)."""

    __slots__ = ("items", "_hash")

    def __init__(self, items: tuple[tuple[str, Any], ...]):
        self.items = items
        try:
            self._hash = hash(tuple((k, _freeze(v)) for k, v in items))
        except TypeError:
            # Unhashable static value: fall back to identity hashing; jit
            # caching degrades but correctness is preserved.
            self._hash = object.__hash__(self)

    def __hash__(self) -> int:
        return self._hash

    def __eq__(self, other: Any) -> bool:
        if not isinstance(other, _Static):
            return NotImplemented
        if len(self.items) != len(other.items):
            return False
        for (ka, va), (kb, vb) in zip(self.items, other.items):
            if ka != kb:
                return False
            eq = va == vb
            if isinstance(eq, (np.ndarray, jax.Array)):
                eq = bool(np.all(eq))
            if not eq:
                return False
        return True

    def __repr__(self) -> str:
        return f"_Static({dict(self.items)!r})"


class Module:
    """Base class: subclasses are auto-registered as JAX pytree nodes."""

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)

        def flatten_with_keys(m: "Module"):
            dyn, stat = [], []
            for name in sorted(m.__dict__):
                v = m.__dict__[name]
                if _is_dynamic(v):
                    dyn.append((tree_util.GetAttrKey(name), v))
                else:
                    stat.append((name, v))
            dyn_names = tuple(k.name for k, _ in dyn)
            return dyn, (dyn_names, _Static(tuple(stat)))

        def flatten(m: "Module"):
            kids, aux = flatten_with_keys(m)
            return [v for _, v in kids], aux

        def unflatten(aux, children):
            dyn_names, stat = aux
            obj = object.__new__(cls)
            d = obj.__dict__
            for name, v in zip(dyn_names, children):
                d[name] = v
            for name, v in stat.items:
                d[name] = v
            return obj

        tree_util.register_pytree_with_keys(
            cls, flatten_with_keys, unflatten, flatten_func=flatten
        )

    # -- convenience -------------------------------------------------------

    def tree_replace(self, **updates: Any) -> "Module":
        """Return a shallow copy with the given attributes replaced."""
        obj = object.__new__(type(self))
        obj.__dict__.update(self.__dict__)
        obj.__dict__.update(updates)
        return obj

    def astype(self, dtype) -> "Module":
        """Cast all floating-point array leaves to ``dtype``."""

        def cast(x):
            if hasattr(x, "dtype") and jax.numpy.issubdtype(x.dtype, jax.numpy.floating):
                return x.astype(dtype)
            return x

        return jax.tree_util.tree_map(cast, self)

    def num_params(self) -> int:
        return sum(
            int(np.prod(x.shape))
            for x in jax.tree_util.tree_leaves(self)
            if hasattr(x, "shape")
        )

    def num_bytes(self) -> int:
        """Resident parameter bytes (quantized uint8 codes count 1 byte)."""
        return sum(
            int(np.prod(x.shape)) * x.dtype.itemsize
            for x in jax.tree_util.tree_leaves(self)
            if hasattr(x, "shape") and hasattr(x, "dtype")
        )


def _path_str(path) -> str:
    parts = []
    for p in path:
        if isinstance(p, tree_util.GetAttrKey):
            parts.append(p.name)
        elif isinstance(p, tree_util.SequenceKey):
            parts.append(str(p.idx))
        elif isinstance(p, tree_util.DictKey):
            parts.append(str(p.key))
        else:  # pragma: no cover
            parts.append(str(p))
    return ".".join(parts)


def named_arrays(module: Any) -> Iterator[tuple[str, jax.Array]]:
    """Yield ``(dotted_path, array)`` for every array leaf in the module."""
    leaves = tree_util.tree_flatten_with_path(module)[0]
    for path, leaf in leaves:
        yield _path_str(path), leaf


def update_arrays(module: Any, updates: dict[str, Any], strict: bool = True) -> Any:
    """Functionally replace array leaves by dotted path.

    ``updates`` maps dotted paths (as produced by :func:`named_arrays`) to new
    arrays.  With ``strict`` the shapes must match and every update path must
    exist.
    """
    updates = dict(updates)
    leaves_with_path, treedef = tree_util.tree_flatten_with_path(module)
    new_leaves = []
    for path, leaf in leaves_with_path:
        key = _path_str(path)
        if key in updates:
            new = updates.pop(key)
            if strict and hasattr(leaf, "shape") and tuple(new.shape) != tuple(leaf.shape):
                raise ValueError(
                    f"shape mismatch for {key}: expected {tuple(leaf.shape)}, "
                    f"got {tuple(new.shape)}"
                )
            new_leaves.append(jax.numpy.asarray(new, dtype=getattr(leaf, "dtype", None)))
        else:
            new_leaves.append(leaf)
    if strict and updates:
        raise KeyError(f"unknown parameter paths: {sorted(updates)[:10]}")
    return tree_util.tree_unflatten(treedef, new_leaves)


def map_arrays(module: Any, fn: Callable[[str, jax.Array], jax.Array]) -> Any:
    """Map ``fn(path, leaf) -> leaf`` over all array leaves."""
    leaves_with_path, treedef = tree_util.tree_flatten_with_path(module)
    return tree_util.tree_unflatten(
        treedef, [fn(_path_str(p), x) for p, x in leaves_with_path]
    )
