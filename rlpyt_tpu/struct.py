"""Core pytree data plumbing — the TPU-native replacement for rlpyt's
``namedarraytuple`` layer (reference: rlpyt/utils/collections.py,
rlpyt/utils/buffer.py, rlpyt/utils/tensor.py).

rlpyt built a namedtuple subclass whose ``__getitem__`` indexes into every
leaf array at once so that one logical object can be backed by many numpy
arrays in OS shared memory.  On TPU the same role is played by JAX pytrees:
a nested structure of device arrays, indexed with ``tree_index`` and sharded
with ``jax.sharding.NamedSharding``.  No shared memory is needed because the
sampler, replay, and learner all live inside one jitted program.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Sequence, TypeVar

import jax
import jax.numpy as jnp
import numpy as np

T = TypeVar("T")

# ---------------------------------------------------------------------------
# Struct dataclass: immutable pytree container (flax.struct-alike, no dep).
# ---------------------------------------------------------------------------


def dataclass(cls=None, **kwargs):
    """Register a frozen dataclass as a JAX pytree.

    Replacement for ``namedarraytuple`` class creation
    (rlpyt/utils/collections.py:namedarraytuple ~L20): fields are pytree
    children; use ``field(pytree_node=False)`` for static metadata.
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True, **kwargs)(c)
        meta_fields = []
        data_fields = []
        for f in dataclasses.fields(c):
            if f.metadata.get("pytree_node", True):
                data_fields.append(f.name)
            else:
                meta_fields.append(f.name)

        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=meta_fields
        )

        def replace(self, **updates):
            return dataclasses.replace(self, **updates)

        c.replace = replace
        return c

    if cls is None:
        return wrap
    return wrap(cls)


def field(pytree_node=True, **kwargs):
    return dataclasses.field(metadata={"pytree_node": pytree_node}, **kwargs)


# ---------------------------------------------------------------------------
# Tree-wide indexing: the namedarraytuple `s[t, b]` idiom.
# ---------------------------------------------------------------------------


def tree_index(tree: T, idx) -> T:
    """Index every leaf: ``tree_index(s, (t, b))`` ≡ rlpyt ``s[t, b]``."""
    return jax.tree.map(lambda x: x[idx], tree)


def tree_take(tree: T, indices, axis: int = 0) -> T:
    """Gather along ``axis`` of every leaf (batched replay extraction)."""
    return jax.tree.map(lambda x: jnp.take(x, indices, axis=axis), tree)


def tree_set(tree: T, idx, value: T) -> T:
    """Functional ``s[idx] = value`` over all leaves (ring-buffer insert)."""
    return jax.tree.map(lambda x, v: x.at[idx].set(v), tree, value)


def tree_dynamic_set(tree: T, start: jax.Array, value: T, axis: int = 0) -> T:
    """Functional dynamic-slice write of a [n, ...] block at ``start``."""

    def _set(x, v):
        idx = [0] * x.ndim
        idx[axis] = start
        return jax.lax.dynamic_update_slice(x, v.astype(x.dtype), tuple(idx))

    return jax.tree.map(_set, tree, value)


def tree_concat(trees: Sequence[T], axis: int = 0) -> T:
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=axis), *trees)


def tree_stack(trees: Sequence[T], axis: int = 0) -> T:
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=axis), *trees)


def tree_zeros_like(tree: T) -> T:
    return jax.tree.map(jnp.zeros_like, tree)


def tree_select(pred, on_true: T, on_false: T) -> T:
    """Per-leaf ``where`` with broadcasting over trailing dims.

    ``pred`` may have fewer dims than leaves (e.g. per-env done flags [B]
    selecting over [B, ...] leaves) — reshaped to broadcast from the left.
    """

    def _sel(a, b):
        p = pred
        extra = a.ndim - p.ndim
        if extra > 0:
            p = p.reshape(p.shape + (1,) * extra)
        return jnp.where(p, a, b)

    return jax.tree.map(_sel, on_true, on_false)


# ---------------------------------------------------------------------------
# Example-driven buffer construction (rlpyt/utils/buffer.py:buffer_from_example).
# ---------------------------------------------------------------------------


def buffer_from_example(example: T, leading_dims: Sequence[int]) -> T:
    """Allocate a zeroed pytree with ``leading_dims`` prepended to each leaf.

    The HBM analogue of rlpyt's shared-memory arena allocation
    (rlpyt/utils/buffer.py:build_array ~L40): samplers and replays call this
    with (T, B) or (size_T, B) leading dims.
    """
    lead = tuple(leading_dims)

    def _alloc(x):
        x = jnp.asarray(x)
        return jnp.zeros(lead + x.shape, x.dtype)

    return jax.tree.map(_alloc, example)


def get_leading_dims(tree, n_dims: int = 1) -> tuple:
    """Leading dims shared by all leaves (rlpyt/utils/buffer.py:get_leading_dims)."""
    leaves = jax.tree.leaves(tree)
    if not leaves:
        return ()
    lead = leaves[0].shape[:n_dims]
    for leaf in leaves[1:]:
        if leaf.shape[:n_dims] != lead:
            raise ValueError(
                f"Mismatched leading dims: {leaf.shape[:n_dims]} vs {lead}"
            )
    return lead


# ---------------------------------------------------------------------------
# Leading-dim inference (rlpyt/utils/tensor.py:infer_leading_dims ~L10).
# ---------------------------------------------------------------------------


def infer_leading_dims(x: jax.Array, dim: int):
    """Classify input as [], [B], or [T,B] + feature dims.

    Returns (lead_dim, T, B, feature_shape).  Models call this so one
    ``apply`` serves the sampler (B-leading), the algo (T,B-leading), and
    single-step debugging ([]), mirroring rlpyt's universal model idiom.
    """
    lead_dim = x.ndim - dim
    assert lead_dim in (0, 1, 2), f"Bad leading dims: {x.shape} with dim={dim}"
    if lead_dim == 2:
        T, B = x.shape[:2]
    elif lead_dim == 1:
        T, B = 1, x.shape[0]
    else:
        T, B = 1, 1
    return lead_dim, T, B, x.shape[lead_dim:]


def infer_leading_dims_tree(observation, dim: int = 1):
    """Pytree-aware ``infer_leading_dims`` + flatten-and-concat (rlpyt's
    Composite observations: spaces/composite.py mapped a tuple of spaces
    onto a namedarraytuple whose leaves all share the leading dims; here
    the container is any pytree, e.g. a dict observation).

    Each leaf is treated as having ``dim`` trailing feature dims (the
    common case for vector observations is 1); leaves are flattened to
    [T*B, prod(feat)] and concatenated along the feature axis in
    canonical pytree-leaf order.  Returns (lead_dim, T, B, x) with x of
    shape [T*B, F_total].  A bare array input degrades to the scalar
    helper unchanged.
    """
    leaves = jax.tree_util.tree_leaves(observation)
    lead_dim, T, B, _ = infer_leading_dims(leaves[0], dim)
    flat = [l.reshape((T * B, -1)).astype(jnp.float32) for l in leaves]
    return lead_dim, T, B, jnp.concatenate(flat, axis=-1)


def restore_leading_dims(x, lead_dim: int, T: int = 1, B: int = 1):
    """Undo the [T*B] flattening (rlpyt/utils/tensor.py:restore_leading_dims)."""

    def _restore(y):
        if lead_dim == 2:
            return y.reshape((T, B) + y.shape[1:])
        if lead_dim == 1:
            return y.reshape((B,) + y.shape[1:])
        return y.reshape(y.shape[1:])

    return jax.tree.map(_restore, x)


def select_at_indexes(indexes: jax.Array, x: jax.Array) -> jax.Array:
    """``x[..., indexes]`` along the last axis, batched over leading dims
    (rlpyt/utils/tensor.py:select_at_indexes): Q(s, a) extraction."""
    return jnp.take_along_axis(x, indexes[..., None].astype(jnp.int32), axis=-1)[
        ..., 0
    ]


def to_onehot(indexes: jax.Array, num: int, dtype=jnp.float32) -> jax.Array:
    return jax.nn.one_hot(indexes, num, dtype=dtype)


def from_onehot(onehot: jax.Array, dtype=jnp.int32) -> jax.Array:
    return jnp.argmax(onehot, axis=-1).astype(dtype)


def valid_mean(x: jax.Array, valid: jax.Array | None = None) -> jax.Array:
    """Mean over valid (non-padded) entries (rlpyt/utils/tensor.py:valid_mean)."""
    if valid is None:
        return jnp.mean(x)
    valid = valid.astype(x.dtype)
    return jnp.sum(x * valid) / jnp.maximum(jnp.sum(valid), 1e-8)


# ---------------------------------------------------------------------------
# Host-side helpers.
# ---------------------------------------------------------------------------


def tree_to_numpy(tree: T) -> T:
    return jax.tree.map(np.asarray, tree)


def tree_map_with_path_names(fn: Callable[[str, Any], Any], tree: T) -> T:
    """Map with '/'-joined key-path names (for partition rules / logging)."""

    def _fn(path, leaf):
        name = "/".join(str(getattr(p, "name", getattr(p, "idx", p))) for p in path)
        return fn(name, leaf)

    return jax.tree_util.tree_map_with_path(_fn, tree)


def tree_copy(tree: T) -> T:
    """Fresh buffers for every leaf — required before donating a carry that
    would otherwise alias (e.g. target_params initialized from params)."""
    return jax.tree.map(jnp.copy, tree)
