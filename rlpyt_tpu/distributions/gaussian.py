"""Diagonal Gaussian with optional tanh squashing (reference:
rlpyt/distributions/gaussian.py:Gaussian ~L15 — incl. the squash log-prob
correction used by SAC, std clamps, and noise clipping for TD3).
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

EPS = 1e-6
LOG2 = math.log(2.0)


class DistInfoStd(NamedTuple):
    mean: jax.Array
    log_std: jax.Array


class Gaussian:
    def __init__(
        self,
        dim: int,
        std: Optional[float] = None,       # fixed std overrides log_std
        clip: Optional[float] = None,      # noise clip (TD3 smoothing)
        noise_clip: Optional[float] = None,
        min_std: Optional[float] = None,
        max_std: Optional[float] = None,
        squash: Optional[float] = None,    # tanh squash scale (SAC)
    ):
        self.dim = dim
        self.std = std
        self.clip = clip
        self.noise_clip = noise_clip
        self.min_std = min_std
        self.max_std = max_std
        self.squash = squash

    # ------------------------------------------------------------------

    def _effective_std(self, dist_info: DistInfoStd) -> jax.Array:
        if self.std is not None:
            return jnp.full_like(dist_info.mean, self.std)
        log_std = dist_info.log_std
        if self.min_std is not None or self.max_std is not None:
            lo = math.log(self.min_std) if self.min_std else -jnp.inf
            hi = math.log(self.max_std) if self.max_std else jnp.inf
            log_std = jnp.clip(log_std, lo, hi)
        return jnp.exp(log_std)

    def sample(self, key: jax.Array, dist_info: DistInfoStd) -> jax.Array:
        std = self._effective_std(dist_info)
        noise = std * jax.random.normal(key, dist_info.mean.shape)
        if self.noise_clip is not None:
            noise = jnp.clip(noise, -self.noise_clip, self.noise_clip)
        sample = dist_info.mean + noise
        if self.clip is not None:
            sample = jnp.clip(sample, -self.clip, self.clip)
        if self.squash is not None:
            sample = self.squash * jnp.tanh(sample)
        return sample

    def sample_with_log_prob(self, key: jax.Array, dist_info: DistInfoStd):
        """Reparameterized sample + log π (the SAC path).

        Uses the numerically stable tanh correction
        log(1 - tanh(x)^2) = 2*(log2 - x - softplus(-2x)).
        """
        std = self._effective_std(dist_info)
        z = dist_info.mean + std * jax.random.normal(key, dist_info.mean.shape)
        logp = self._normal_log_prob(z, dist_info.mean, std)
        if self.squash is not None:
            correction = 2.0 * (LOG2 - z - jax.nn.softplus(-2.0 * z))
            logp = logp - jnp.sum(correction, axis=-1)
            action = self.squash * jnp.tanh(z)
        else:
            action = z
        return action, logp

    @staticmethod
    def _normal_log_prob(x, mean, std):
        var = std**2
        return jnp.sum(
            -((x - mean) ** 2) / (2 * var) - jnp.log(std)
            - 0.5 * math.log(2 * math.pi),
            axis=-1,
        )

    def log_likelihood(self, x: jax.Array,
                       dist_info: DistInfoStd) -> jax.Array:
        std = self._effective_std(dist_info)
        if self.squash is not None:
            # invert the squash: z = atanh(x / squash)
            u = jnp.clip(x / self.squash, -1 + EPS, 1 - EPS)
            z = jnp.arctanh(u)
            logp = self._normal_log_prob(z, dist_info.mean, std)
            correction = 2.0 * (LOG2 - z - jax.nn.softplus(-2.0 * z))
            return logp - jnp.sum(correction, axis=-1)
        return self._normal_log_prob(x, dist_info.mean, std)

    def likelihood_ratio(self, x, old_dist_info, new_dist_info):
        return jnp.exp(self.log_likelihood(x, new_dist_info)
                       - self.log_likelihood(x, old_dist_info))

    def kl(self, old: DistInfoStd, new: DistInfoStd) -> jax.Array:
        old_std = self._effective_std(old)
        new_std = self._effective_std(new)
        return jnp.sum(
            jnp.log(new_std / (old_std + EPS) + EPS)
            + (old_std**2 + (old.mean - new.mean) ** 2)
            / (2 * new_std**2 + EPS) - 0.5,
            axis=-1,
        )

    def entropy(self, dist_info: DistInfoStd) -> jax.Array:
        std = self._effective_std(dist_info)
        return jnp.sum(jnp.log(std + EPS)
                       + 0.5 * (1.0 + math.log(2 * math.pi)), axis=-1)

    def perplexity(self, dist_info):
        return jnp.exp(self.entropy(dist_info))

    def mean_kl(self, old, new, valid=None):
        from rlpyt_tpu.struct import valid_mean
        return valid_mean(self.kl(old, new), valid)

    def mean_entropy(self, dist_info, valid=None):
        from rlpyt_tpu.struct import valid_mean
        return valid_mean(self.entropy(dist_info), valid)
