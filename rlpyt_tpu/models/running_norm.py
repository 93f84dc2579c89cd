"""Running observation normalization (reference:
rlpyt/models/running_mean_std.py:RunningMeanStdModel ~L10).

Implemented as flax variables in a mutable 'norm_stats' collection; the algo
update step applies batch moments with Chan's parallel update.  In the
data-parallel mesh the moments are all-reduced with ``lax.pmean`` when an
axis name is given (the reference's distributed all-reduce of moments).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class RunningMeanStd(nn.Module):
    axis_name: str | None = None
    clip: float = 10.0

    @nn.compact
    def __call__(self, x, update: bool = False):
        shape = x.shape[-1:]
        mean = self.variable("norm_stats", "mean",
                             lambda: jnp.zeros(shape, jnp.float32))
        var = self.variable("norm_stats", "var",
                            lambda: jnp.ones(shape, jnp.float32))
        count = self.variable("norm_stats", "count",
                              lambda: jnp.full((), 1e-4, jnp.float32))
        if update:
            flat = x.reshape(-1, shape[0]).astype(jnp.float32)
            b_mean = flat.mean(axis=0)
            b_var = flat.var(axis=0)
            b_count = jnp.float32(flat.shape[0])
            if self.axis_name is not None:
                b_mean = jax.lax.pmean(b_mean, self.axis_name)
                b_var = jax.lax.pmean(b_var, self.axis_name)
                b_count = jax.lax.psum(b_count, self.axis_name)
            delta = b_mean - mean.value
            tot = count.value + b_count
            new_mean = mean.value + delta * b_count / tot
            m_a = var.value * count.value
            m_b = b_var * b_count
            m2 = m_a + m_b + delta**2 * count.value * b_count / tot
            mean.value = new_mean
            var.value = m2 / tot
            count.value = tot
        normed = (x - mean.value) * jax.lax.rsqrt(var.value + 1e-8)
        return jnp.clip(normed, -self.clip, self.clip)
