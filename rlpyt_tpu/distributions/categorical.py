"""Categorical distribution (reference: rlpyt/distributions/categorical.py
~L10, rlpyt/distributions/base.py:Distribution ~L5).

Stateless: every method is a pure function; sampling takes an explicit key.
``DistInfo`` carries probabilities through the sample buffers exactly as the
reference's namedarraytuple does — here as a NamedTuple pytree.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

EPS = 1e-8


class DistInfo(NamedTuple):
    prob: jax.Array  # [..., n]


class Categorical:
    def __init__(self, dim: int):
        self.dim = dim

    def sample(self, key: jax.Array, dist_info: DistInfo) -> jax.Array:
        logits = jnp.log(jnp.maximum(dist_info.prob, EPS))
        return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)

    def log_likelihood(self, x: jax.Array, dist_info: DistInfo) -> jax.Array:
        prob = jnp.take_along_axis(
            dist_info.prob, x[..., None].astype(jnp.int32), axis=-1)[..., 0]
        return jnp.log(jnp.maximum(prob, EPS))

    def likelihood_ratio(self, x, old_dist_info: DistInfo,
                         new_dist_info: DistInfo) -> jax.Array:
        num = jnp.take_along_axis(
            new_dist_info.prob, x[..., None].astype(jnp.int32), axis=-1)[..., 0]
        den = jnp.take_along_axis(
            old_dist_info.prob, x[..., None].astype(jnp.int32), axis=-1)[..., 0]
        return (num + EPS) / (den + EPS)

    def kl(self, old: DistInfo, new: DistInfo) -> jax.Array:
        p, q = old.prob, new.prob
        return jnp.sum(p * (jnp.log(jnp.maximum(p, EPS))
                            - jnp.log(jnp.maximum(q, EPS))), axis=-1)

    def entropy(self, dist_info: DistInfo) -> jax.Array:
        p = dist_info.prob
        return -jnp.sum(p * jnp.log(jnp.maximum(p, EPS)), axis=-1)

    def perplexity(self, dist_info: DistInfo) -> jax.Array:
        return jnp.exp(self.entropy(dist_info))

    def mean_kl(self, old, new, valid=None):
        from rlpyt_tpu.struct import valid_mean
        return valid_mean(self.kl(old, new), valid)

    def mean_entropy(self, dist_info, valid=None):
        from rlpyt_tpu.struct import valid_mean
        return valid_mean(self.entropy(dist_info), valid)
