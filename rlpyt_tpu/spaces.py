"""Action/observation spaces (reference: rlpyt/spaces/).

Pure-metadata objects: ``sample`` takes an explicit JAX PRNG key (rlpyt's
spaces used global numpy RNG — here every random draw is keyed, which is what
makes fixed-seed trajectories exactly reproducible across shardings).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Space:
    """Interface (rlpyt/spaces/base.py:Space ~L5): sample + null_value."""

    shape: Tuple[int, ...]
    dtype: Any

    def sample(self, key: jax.Array) -> jax.Array:
        raise NotImplementedError

    def null_value(self) -> jax.Array:
        """The zero element used to prefill buffers (prev_action at reset)."""
        raise NotImplementedError


class IntBox(Space):
    """Discrete range [low, high) (rlpyt/spaces/int_box.py:IntBox ~L10)."""

    def __init__(self, low: int, high: int, shape: Tuple[int, ...] = (),
                 dtype=jnp.int32):
        assert high > low
        self.low = low
        self.high = high
        self.shape = tuple(shape)
        self.dtype = dtype

    @property
    def n(self) -> int:
        return self.high - self.low

    def sample(self, key: jax.Array) -> jax.Array:
        return jax.random.randint(key, self.shape, self.low, self.high,
                                  dtype=self.dtype)

    def null_value(self) -> jax.Array:
        return jnp.zeros(self.shape, self.dtype)

    def __repr__(self):
        return f"IntBox({self.low}, {self.high}, shape={self.shape})"


class FloatBox(Space):
    """Continuous box (rlpyt/spaces/float_box.py:FloatBox ~L10)."""

    def __init__(self, low, high, shape: Tuple[int, ...] | None = None,
                 dtype=jnp.float32):
        low = np.asarray(low, dtype=np.float32)
        high = np.asarray(high, dtype=np.float32)
        if shape is None:
            shape = np.broadcast_shapes(low.shape, high.shape)
        self.low = np.broadcast_to(low, shape).astype(np.float32)
        self.high = np.broadcast_to(high, shape).astype(np.float32)
        self.shape = tuple(shape)
        self.dtype = dtype

    def sample(self, key: jax.Array) -> jax.Array:
        u = jax.random.uniform(key, self.shape, dtype=self.dtype)
        low = jnp.asarray(self.low, self.dtype)
        high = jnp.asarray(self.high, self.dtype)
        return low + u * (high - low)

    def null_value(self) -> jax.Array:
        return jnp.zeros(self.shape, self.dtype)

    def __repr__(self):
        return f"FloatBox(shape={self.shape})"


class Composite(Space):
    """Dict-of-spaces mapped onto a pytree (rlpyt/spaces/composite.py ~L10).

    rlpyt mapped a tuple of spaces onto a namedarraytuple; here the natural
    container is a plain dict pytree.
    """

    def __init__(self, spaces: Dict[str, Space]):
        self.spaces = dict(spaces)
        self.shape = None
        self.dtype = None

    def sample(self, key: jax.Array):
        keys = jax.random.split(key, len(self.spaces))
        return {
            name: space.sample(k)
            for (name, space), k in zip(self.spaces.items(), keys)
        }

    def null_value(self):
        return {name: s.null_value() for name, s in self.spaces.items()}

    def __repr__(self):
        return f"Composite({self.spaces})"
