"""Value-function ops: Huber loss, C51 categorical projection, R2D1 value
rescaling, polyak target updates.

References: rlpyt/algos/dqn/dqn.py:loss (Huber ~L220),
rlpyt/algos/dqn/cat_dqn.py:loss (projection ~L40),
rlpyt/algos/dqn/r2d1.py (h/h⁻¹ ~L60),
rlpyt/models/utils.py:update_state_dict (polyak ~L20).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def huber_loss(delta: jax.Array, clip: float = 1.0) -> jax.Array:
    """Elementwise Huber on the TD error δ (delta_clip in the reference)."""
    abs_d = jnp.abs(delta)
    quad = jnp.minimum(abs_d, clip)
    return 0.5 * quad**2 + clip * (abs_d - quad)


def categorical_projection(
    target_p: jax.Array,   # [..., n_atoms] next-state atom probabilities
    returns: jax.Array,    # [...] n-step return r
    nonterminal: jax.Array,  # [...] 1.0 if bootstrapping allowed
    z: jax.Array,          # [n_atoms] fixed support
    discount_n: float,     # γ^n
) -> jax.Array:
    """Project the shifted support ``r + γⁿ z`` back onto ``z``
    (rlpyt/algos/dqn/cat_dqn.py:loss — the C51 Bellman backup).

    Fully vectorized: computes the triangular-kernel overlap of every shifted
    atom with every fixed atom — an outer [..., n, n] product that XLA maps
    onto the VPU; no scatter needed.
    """
    v_min, v_max = z[0], z[-1]
    dz = z[1] - z[0]
    tz = returns[..., None] + discount_n * nonterminal[..., None] * z
    tz = jnp.clip(tz, v_min, v_max)
    # weight of shifted atom j on fixed atom i: max(0, 1 - |tz_j - z_i| / dz)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(tz[..., None, :] - z[:, None]) / dz)
    return jnp.sum(w * target_p[..., None, :], axis=-1)


def value_rescale(x: jax.Array, eps: float = 1e-3) -> jax.Array:
    """h(x) = sign(x)(√(|x|+1) − 1) + εx (rlpyt/algos/dqn/r2d1.py ~L60)."""
    return jnp.sign(x) * (jnp.sqrt(jnp.abs(x) + 1.0) - 1.0) + eps * x


def value_rescale_inv(x: jax.Array, eps: float = 1e-3) -> jax.Array:
    """h⁻¹ in closed form (the standard R2D2 inverse)."""
    return jnp.sign(x) * (
        ((jnp.sqrt(1.0 + 4.0 * eps * (jnp.abs(x) + 1.0 + eps)) - 1.0)
         / (2.0 * eps)) ** 2 - 1.0)


def polyak_update(target_params, online_params, tau: float):
    """target ← τ·online + (1−τ)·target
    (rlpyt/models/utils.py:update_state_dict).  tau=1 is a hard copy."""
    if tau == 1.0:
        return online_params
    return jax.tree.map(
        lambda t, o: t + tau * (o - t), target_params, online_params)
