"""Q-value policy-gradient models (reference: rlpyt/models/qpg/mlp.py:
MuMlpModel, QofMuMlpModel, PiMlpModel ~L10).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from rlpyt_tpu.models.mlp import MlpModel
from rlpyt_tpu.struct import infer_leading_dims, restore_leading_dims


class MuMlpModel(nn.Module):
    """Deterministic policy μ(s) with tanh output scaled to action bounds
    (DDPG/TD3 actor)."""

    action_size: int
    hidden_sizes: Sequence[int] = (256, 256)
    output_max: float = 1.0
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, observation, prev_action=None, prev_reward=None):
        lead_dim, T, B, obs_shape = infer_leading_dims(observation, 1)
        obs = observation.reshape((T * B,) + obs_shape).astype(jnp.float32)
        mu = MlpModel(self.hidden_sizes, self.action_size,
                      compute_dtype=self.compute_dtype)(obs)
        mu = self.output_max * jnp.tanh(mu)
        return restore_leading_dims(mu, lead_dim, T, B)


class QofMuMlpModel(nn.Module):
    """Q(s, a) critic (DDPG/TD3/SAC)."""

    hidden_sizes: Sequence[int] = (256, 256)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, observation, action, prev_action=None,
                 prev_reward=None):
        lead_dim, T, B, obs_shape = infer_leading_dims(observation, 1)
        obs = observation.reshape((T * B,) + obs_shape).astype(jnp.float32)
        act = action.reshape(T * B, -1).astype(jnp.float32)
        x = jnp.concatenate([obs, act], axis=-1)
        q = MlpModel(self.hidden_sizes, 1,
                     compute_dtype=self.compute_dtype)(x)[..., 0]
        return restore_leading_dims(q, lead_dim, T, B)


class PiMlpModel(nn.Module):
    """SAC stochastic policy: outputs (μ, log_std) of a pre-squash
    Gaussian (rlpyt/models/qpg/mlp.py:PiMlpModel)."""

    action_size: int
    hidden_sizes: Sequence[int] = (256, 256)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, observation, prev_action=None, prev_reward=None):
        lead_dim, T, B, obs_shape = infer_leading_dims(observation, 1)
        obs = observation.reshape((T * B,) + obs_shape).astype(jnp.float32)
        out = MlpModel(self.hidden_sizes, 2 * self.action_size,
                       compute_dtype=self.compute_dtype)(obs)
        mu, log_std = jnp.split(out, 2, axis=-1)
        return restore_leading_dims((mu, log_std), lead_dim, T, B)


class VMlpModel(nn.Module):
    """State-value V(s) MLP (rlpyt/models/qpg/mlp.py:VMlpModel — used by
    the original-formulation SAC; kept for parity although the shipped
    SAC uses the modern no-V twin-Q form, as the reference's does)."""

    hidden_sizes: Sequence[int] = (256, 256)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, observation, prev_action=None, prev_reward=None):
        lead_dim, T, B, obs_shape = infer_leading_dims(observation, 1)
        obs = observation.reshape((T * B,) + obs_shape).astype(jnp.float32)
        v = MlpModel(self.hidden_sizes, 1,
                     compute_dtype=self.compute_dtype)(obs)[..., 0]
        return restore_leading_dims(v, lead_dim, T, B)
