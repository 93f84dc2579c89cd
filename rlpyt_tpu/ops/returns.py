"""Return/advantage math (reference: rlpyt/algos/utils.py:discount_return,
generalized_advantage_estimation, discount_return_n_step, valid_from_done
~L10-120).

The reference runs backward Python loops over T on torch tensors.  Here the
backward recurrences are ``jax.lax.associative_scan`` over the time axis —
O(log T) depth, fully parallel on the VPU — operating on whole [T, B] blocks.

The recurrence r_t = x_t + c_t * r_{t+1} is associative under the pairing
(c, x) ∘ (c', x') = (c*c', x' + c' * x) applied on the reversed sequence.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _discounted_reverse_scan(x: jax.Array, coef: jax.Array) -> jax.Array:
    """Solve r_t = x_t + coef_t * r_{t+1}, r_T = 0, for all t. [T, ...]"""

    def combine(a, b):
        ca, xa = a
        cb, xb = b
        return ca * cb, xb + cb * xa

    xr = jnp.flip(x, axis=0)
    cr = jnp.flip(coef, axis=0)
    _, out = jax.lax.associative_scan(combine, (cr, xr), axis=0)
    return jnp.flip(out, axis=0)


def discount_return(reward: jax.Array, done: jax.Array, bootstrap_value,
                    discount: float) -> jax.Array:
    """γ-discounted returns with bootstrap
    (rlpyt/algos/utils.py:discount_return).

    reward, done: [T, B]; bootstrap_value: [B] (value of s_{T}).
    done[t] True ⇒ no bootstrapping across t (episode ended at step t).
    """
    not_done = 1.0 - done.astype(reward.dtype)
    coef = discount * not_done
    # Fold the bootstrap into the last reward: r'_{T-1} = r_{T-1} + γ(1-d)V.
    x = reward.at[-1].add(coef[-1] * bootstrap_value)
    return _discounted_reverse_scan(x, coef)


def generalized_advantage_estimation(
    reward: jax.Array,
    value: jax.Array,
    done: jax.Array,
    bootstrap_value: jax.Array,
    discount: float,
    gae_lambda: float,
) -> Tuple[jax.Array, jax.Array]:
    """GAE(λ) (rlpyt/algos/utils.py:generalized_advantage_estimation).

    All [T, B]; bootstrap_value [B].  Returns (advantage, return_ =
    advantage + value), matching the reference's outputs.
    """
    not_done = 1.0 - done.astype(reward.dtype)
    next_value = jnp.concatenate(
        [value[1:], bootstrap_value[None]], axis=0)
    delta = reward + discount * next_value * not_done - value
    advantage = _discounted_reverse_scan(
        delta, discount * gae_lambda * not_done)
    return advantage, advantage + value


def discount_return_n_step(
    reward: jax.Array,
    done: jax.Array,
    n_step: int,
    discount: float,
) -> Tuple[jax.Array, jax.Array]:
    """n-step truncated returns + done-within-n flags
    (rlpyt/algos/utils.py:discount_return_n_step).

    reward, done: [T, B] with T >= n_step.  Output [T - n_step + 1, B]:
      return_[t] = Σ_{k<n} γ^k r_{t+k} (stopping at the first done)
      done_n[t]  = any(done[t : t+n])
    Static unroll over n_step (small: 1–5) — XLA fuses it.
    """
    T = reward.shape[0]
    out_T = T - n_step + 1
    ret = reward[:out_T].astype(jnp.float32)
    done_n = done[:out_T].astype(jnp.bool_)
    if n_step > 1:
        for k in range(1, n_step):
            not_done = 1.0 - done_n.astype(jnp.float32)
            ret = ret + (discount**k) * reward[k:k + out_T] * not_done
            done_n = done_n | done[k:k + out_T]
    return ret, done_n


def valid_from_done(done: jax.Array) -> jax.Array:
    """Validity mask: 1 until (and including) the first done, 0 after
    (rlpyt/algos/utils.py:valid_from_done).  done: [T, B] → valid [T, B]."""
    done = done.astype(jnp.float32)
    prior_done = jnp.concatenate(
        [jnp.zeros_like(done[:1]), jnp.cumsum(done, axis=0)[:-1]], axis=0)
    return (prior_done < 1).astype(jnp.float32)
