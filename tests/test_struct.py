"""Unit tests for the core pytree data layer (rlpyt_tpu/struct.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlpyt_tpu import struct


def test_tree_index():
    tree = {"a": jnp.arange(24).reshape(4, 6), "b": jnp.ones((4, 6, 2))}
    out = struct.tree_index(tree, (2, 3))
    assert out["a"] == 15
    assert out["b"].shape == (2,)


def test_buffer_from_example():
    ex = {"obs": jnp.zeros((4,)), "act": jnp.zeros((), jnp.int32)}
    buf = struct.buffer_from_example(ex, (10, 3))
    assert buf["obs"].shape == (10, 3, 4)
    assert buf["act"].shape == (10, 3)
    assert buf["act"].dtype == jnp.int32


def test_tree_dynamic_set():
    buf = jnp.zeros((10, 3))
    val = jnp.ones((4, 3))
    out = struct.tree_dynamic_set(buf, jnp.int32(2), val)
    assert float(out[1].sum()) == 0
    assert float(out[2:6].sum()) == 12
    assert float(out[6:].sum()) == 0


def test_tree_select_broadcast():
    done = jnp.array([True, False, True])
    a = jnp.ones((3, 4))
    b = jnp.zeros((3, 4))
    out = struct.tree_select(done, a, b)
    np.testing.assert_array_equal(np.asarray(out[:, 0]), [1, 0, 1])


def test_infer_restore_leading_dims():
    x = jnp.zeros((5, 7, 3, 8, 8))
    lead, T, B, shape = struct.infer_leading_dims(x, 3)
    assert (lead, T, B, shape) == (2, 5, 7, (3, 8, 8))
    flat = x.reshape(T * B, -1)
    y = struct.restore_leading_dims(flat, lead, T, B)
    assert y.shape == (5, 7, 192)

    x1 = jnp.zeros((7, 4))
    lead, T, B, shape = struct.infer_leading_dims(x1, 1)
    assert (lead, T, B, shape) == (1, 1, 7, (4,))


def test_select_at_indexes():
    q = jnp.arange(24, dtype=jnp.float32).reshape(2, 3, 4)
    idx = jnp.array([[0, 1, 2], [3, 0, 1]])
    out = struct.select_at_indexes(idx, q)
    assert out.shape == (2, 3)
    assert float(out[0, 0]) == 0.0
    assert float(out[1, 0]) == 15.0


def test_valid_mean():
    x = jnp.array([1.0, 2.0, 100.0])
    valid = jnp.array([1.0, 1.0, 0.0])
    assert float(struct.valid_mean(x, valid)) == pytest.approx(1.5)


def test_struct_dataclass_pytree():
    @struct.dataclass
    class Foo:
        x: jax.Array
        name: str = struct.field(pytree_node=False, default="f")

    f = Foo(x=jnp.ones(3))
    leaves = jax.tree.leaves(f)
    assert len(leaves) == 1
    f2 = jax.tree.map(lambda v: v * 2, f)
    assert float(f2.x[0]) == 2.0
    assert f2.name == "f"
    f3 = f2.replace(x=jnp.zeros(3))
    assert float(f3.x.sum()) == 0.0
