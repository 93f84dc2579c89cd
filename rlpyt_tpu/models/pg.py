"""Policy-gradient models (reference: rlpyt/models/pg/atari_ff_model.py,
atari_lstm_model.py, mujoco_ff_model.py, mujoco_lstm_model.py).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rlpyt_tpu.models.conv import Conv2dModel
from rlpyt_tpu.models.dqn import (
    ATARI_CHANNELS,
    ATARI_KERNELS,
    ATARI_PADDINGS,
    ATARI_STRIDES,
)
from rlpyt_tpu.models.mlp import MlpModel
from rlpyt_tpu.models.rnn import LstmCore, RnnState
from rlpyt_tpu.models.running_norm import RunningMeanStd
from rlpyt_tpu.struct import infer_leading_dims, restore_leading_dims


class AtariFfModel(nn.Module):
    """Conv trunk → π logits + V (rlpyt/models/pg/atari_ff_model.py ~L10)."""

    n_actions: int
    fc_sizes: Sequence[int] = (512,)
    channels: Sequence[int] = ATARI_CHANNELS
    kernel_sizes: Sequence[int] = ATARI_KERNELS
    strides: Sequence[int] = ATARI_STRIDES
    paddings: Sequence[int] = ATARI_PADDINGS
    obs_divisor: float = 255.0  # 1.0 for binary MinAtar planes
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, observation, prev_action=None, prev_reward=None):
        lead_dim, T, B, img_shape = infer_leading_dims(observation, 3)
        img = observation.reshape((T * B,) + img_shape)
        img = img.astype(self.compute_dtype) * (1.0 / self.obs_divisor)
        x = Conv2dModel(self.channels, self.kernel_sizes, self.strides,
                        self.paddings, compute_dtype=self.compute_dtype)(img)
        x = x.reshape(T * B, -1)
        x = MlpModel(self.fc_sizes, compute_dtype=self.compute_dtype)(x)
        pi_logits = nn.Dense(self.n_actions)(x)
        v = nn.Dense(1)(x)[..., 0]
        return restore_leading_dims((pi_logits, v), lead_dim, T, B)


class AtariLstmModel(nn.Module):
    """Conv → LSTM(+prev a/r) → π, V
    (rlpyt/models/pg/atari_lstm_model.py ~L10)."""

    n_actions: int
    fc_sizes: Sequence[int] = (512,)
    lstm_size: int = 512
    lstm_impl: str = "scan"
    channels: Sequence[int] = ATARI_CHANNELS
    kernel_sizes: Sequence[int] = ATARI_KERNELS
    strides: Sequence[int] = ATARI_STRIDES
    paddings: Sequence[int] = ATARI_PADDINGS
    obs_divisor: float = 255.0  # 1.0 for binary MinAtar planes
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, observation, prev_action, prev_reward,
                 rnn_state: RnnState, done=None):
        lead_dim, T, B, img_shape = infer_leading_dims(observation, 3)
        img = observation.reshape((T * B,) + img_shape)
        img = img.astype(self.compute_dtype) * (1.0 / self.obs_divisor)
        x = Conv2dModel(self.channels, self.kernel_sizes, self.strides,
                        self.paddings, compute_dtype=self.compute_dtype)(img)
        x = x.reshape(T * B, -1)
        x = MlpModel(self.fc_sizes, compute_dtype=self.compute_dtype)(x)
        x = x.reshape(T, B, -1)
        pa = jax.nn.one_hot(prev_action.reshape(T, B), self.n_actions,
                            dtype=x.dtype)
        pr = prev_reward.reshape(T, B, 1).astype(x.dtype)
        lstm_in = jnp.concatenate([x, pa, pr], axis=-1)
        done_tb = (jnp.zeros((T, B), jnp.bool_) if done is None
                   else done.reshape(T, B))
        y, next_state = LstmCore(self.lstm_size, self.lstm_impl)(
            lstm_in, done_tb, rnn_state)
        y = y.reshape(T * B, -1)
        pi_logits = nn.Dense(self.n_actions)(y)
        v = nn.Dense(1)(y)[..., 0]
        pi_logits, v = restore_leading_dims((pi_logits, v), lead_dim, T, B)
        return pi_logits, v, next_state


class MujocoFfModel(nn.Module):
    """MLP → Gaussian μ + state-independent log_std + V
    (rlpyt/models/pg/mujoco_ff_model.py ~L10)."""

    action_size: int
    hidden_sizes: Sequence[int] = (64, 64)
    init_log_std: float = 0.0
    normalize_observation: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, observation, prev_action=None, prev_reward=None):
        lead_dim, T, B, obs_shape = infer_leading_dims(observation, 1)
        obs = observation.reshape((T * B,) + obs_shape)
        if self.normalize_observation:
            obs = RunningMeanStd()(obs)
        x = MlpModel(self.hidden_sizes, compute_dtype=self.compute_dtype)(
            obs.astype(jnp.float32))
        mu = nn.Dense(self.action_size)(x)
        v = MlpModel(self.hidden_sizes, 1,
                     compute_dtype=self.compute_dtype)(
                         obs.astype(jnp.float32))[..., 0]
        log_std = self.param(
            "log_std",
            lambda k: jnp.full((self.action_size,), self.init_log_std,
                               jnp.float32))
        log_std = jnp.broadcast_to(log_std, mu.shape)
        return restore_leading_dims((mu, log_std, v), lead_dim, T, B)


class MujocoLstmModel(nn.Module):
    """Recurrent continuous actor-critic
    (rlpyt/models/pg/mujoco_lstm_model.py ~L10)."""

    action_size: int
    hidden_sizes: Sequence[int] = (256,)
    lstm_size: int = 256
    lstm_impl: str = "scan"
    init_log_std: float = 0.0
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, observation, prev_action, prev_reward,
                 rnn_state: RnnState, done=None):
        lead_dim, T, B, obs_shape = infer_leading_dims(observation, 1)
        obs = observation.reshape(T, B, obs_shape[0]).astype(jnp.float32)
        x = MlpModel(self.hidden_sizes, compute_dtype=self.compute_dtype)(obs)
        pa = prev_action.reshape(T, B, -1).astype(x.dtype)
        pr = prev_reward.reshape(T, B, 1).astype(x.dtype)
        lstm_in = jnp.concatenate([x, pa, pr], axis=-1)
        done_tb = (jnp.zeros((T, B), jnp.bool_) if done is None
                   else done.reshape(T, B))
        y, next_state = LstmCore(self.lstm_size, self.lstm_impl)(
            lstm_in, done_tb, rnn_state)
        y = y.reshape(T * B, -1)
        mu = nn.Dense(self.action_size)(y)
        v = nn.Dense(1)(y)[..., 0]
        log_std = self.param(
            "log_std",
            lambda k: jnp.full((self.action_size,), self.init_log_std,
                               jnp.float32))
        log_std = jnp.broadcast_to(log_std, mu.shape)
        mu, log_std, v = restore_leading_dims((mu, log_std, v),
                                              lead_dim, T, B)
        return mu, log_std, v, next_state
