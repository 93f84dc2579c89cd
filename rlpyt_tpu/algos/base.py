"""Algorithm base (reference: rlpyt/algos/base.py:RlAlgorithm ~L5).

An algorithm is static config + pure functions:
  initialize(agent, batch_spec, example_obs, key, n_itr) -> TrainState (+ replay)
  optimize(train_state, replay_state, samples, key, rollout_state)
      -> (train_state, replay_state, OptInfo)
(``rollout_state`` provides cum_steps for schedules and the final
observation/carry for bootstrap values.)
The runner embeds ``optimize`` in the jitted train iteration; the optimizer
(optax) state lives inside TrainState — replacing torch.optim ownership.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax


def make_optimizer(learning_rate, clip_grad_norm=None, optim: str = "adam",
                   schedule=None, **optim_kwargs):
    """Adam/RMSprop + global-norm clipping (the reference's OptimCls +
    clip_grad_norm_ pattern)."""
    lr = schedule if schedule is not None else learning_rate
    if optim == "adam":
        opt = optax.adam(lr, **optim_kwargs)
    elif optim == "rmsprop":
        opt = optax.rmsprop(lr, **optim_kwargs)
    else:
        raise ValueError(optim)
    if clip_grad_norm is not None:
        opt = optax.chain(optax.clip_by_global_norm(clip_grad_norm), opt)
    return opt


def global_norm(tree) -> jax.Array:
    return optax.global_norm(tree)


class RlAlgorithm:
    """Contract; concrete algos define their own TrainState NamedTuple."""

    bootstrap_value: bool = False  # sampler stores V(s_T) when True

    def initialize(self, agent, batch_spec, example_obs, key, n_itr=1):
        raise NotImplementedError

    def optimize(self, train_state, replay_state, samples, key,
                 rollout_state):
        raise NotImplementedError
