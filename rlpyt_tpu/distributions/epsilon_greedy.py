"""Epsilon-greedy action selection (reference:
rlpyt/distributions/epsilon_greedy.py:EpsilonGreedy,
CategoricalEpsilonGreedy ~L10).

``epsilon`` may be a scalar or a per-env vector [B] — the vectorized-ε
exploration used by R2D1-style distributed collection (each parallel env
explores at its own rate).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


class EpsilonGreedy:
    def __init__(self, dim: int):
        self.dim = dim

    def sample(self, key: jax.Array, q: jax.Array,
               epsilon: jax.Array) -> jax.Array:
        """q: [..., A]; epsilon: scalar or broadcastable to q.shape[:-1]."""
        k1, k2 = jax.random.split(key)
        greedy = jnp.argmax(q, axis=-1).astype(jnp.int32)
        rand = jax.random.randint(k1, greedy.shape, 0, q.shape[-1],
                                  dtype=jnp.int32)
        explore = jax.random.uniform(k2, greedy.shape) < epsilon
        return jnp.where(explore, rand, greedy)


class CategoricalEpsilonGreedy(EpsilonGreedy):
    """Argmax over the expected value of the atom distribution (C51/R2D1)."""

    def __init__(self, dim: int, z: jax.Array):
        super().__init__(dim)
        self.z = z  # atom support [n_atoms]

    def sample(self, key: jax.Array, p: jax.Array,
               epsilon: jax.Array) -> jax.Array:
        """p: [..., A, n_atoms] probabilities over atoms."""
        q = jnp.sum(p * self.z, axis=-1)
        return super().sample(key, q, epsilon)
