"""DQN-family models (reference: rlpyt/models/dqn/atari_dqn_model.py,
dueling.py, atari_catdqn_model.py, atari_r2d1_model.py).

All accept observations with [], [B], or [T,B] leading dims (the rlpyt
universal-model idiom, via struct.infer_leading_dims) and uint8 images in
[C, H, W] layout scaled by 1/255 inside the model.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rlpyt_tpu.models.conv import Conv2dModel
from rlpyt_tpu.models.mlp import MlpModel
from rlpyt_tpu.models.rnn import LstmCore, RnnState
from rlpyt_tpu.ops.pallas.frame_gather import BlockedFrames
from rlpyt_tpu.struct import (
    infer_leading_dims,
    infer_leading_dims_tree,
    restore_leading_dims,
)

# Nature-CNN defaults adapted by rlpyt to its 104x80 frames
# (rlpyt/models/dqn/atari_dqn_model.py ~L30).
ATARI_CHANNELS = (32, 64, 64)
ATARI_KERNELS = (8, 4, 3)
ATARI_STRIDES = (4, 2, 1)
ATARI_PADDINGS = (0, 1, 1)


class DuelingHead(nn.Module):
    """V + A streams with mean-advantage subtraction
    (rlpyt/models/dqn/dueling.py:DuelingHeadModel ~L10)."""

    hidden_sizes: Sequence[int]
    output_size: int
    compute_dtype: jnp.dtype = jnp.float32
    batch_minor_input: bool = False

    @nn.compact
    def __call__(self, x):
        adv = MlpModel(self.hidden_sizes, self.output_size,
                       compute_dtype=self.compute_dtype,
                       batch_minor_input=self.batch_minor_input)(x)
        val = MlpModel(self.hidden_sizes, 1,
                       compute_dtype=self.compute_dtype,
                       batch_minor_input=self.batch_minor_input)(x)
        return val + adv - adv.mean(axis=-1, keepdims=True)


class DistributionalDuelingHead(nn.Module):
    """Dueling over atoms: output [B, A, n_atoms] logits
    (rlpyt/models/dqn/dueling.py:DistributionalDuelingHeadModel ~L60)."""

    hidden_sizes: Sequence[int]
    output_size: int  # number of actions
    n_atoms: int
    compute_dtype: jnp.dtype = jnp.float32
    batch_minor_input: bool = False

    @nn.compact
    def __call__(self, x):
        adv = MlpModel(self.hidden_sizes, self.output_size * self.n_atoms,
                       compute_dtype=self.compute_dtype,
                       batch_minor_input=self.batch_minor_input)(x)
        val = MlpModel(self.hidden_sizes, self.n_atoms,
                       compute_dtype=self.compute_dtype,
                       batch_minor_input=self.batch_minor_input)(x)
        adv = adv.reshape(adv.shape[:-1] + (self.output_size, self.n_atoms))
        val = val.reshape(val.shape[:-1] + (1, self.n_atoms))
        return val + adv - adv.mean(axis=-2, keepdims=True)


class AtariDqnModel(nn.Module):
    """Conv → (dueling) Q head (rlpyt/models/dqn/atari_dqn_model.py ~L15)."""

    n_actions: int
    fc_sizes: Sequence[int] = (512,)
    dueling: bool = False
    channels: Sequence[int] = ATARI_CHANNELS
    kernel_sizes: Sequence[int] = ATARI_KERNELS
    strides: Sequence[int] = ATARI_STRIDES
    paddings: Sequence[int] = ATARI_PADDINGS
    obs_divisor: float = 255.0  # 1.0 for binary MinAtar planes
    compute_dtype: jnp.dtype = jnp.float32
    space_to_depth: bool = True  # exact-math MXU-friendly first conv

    @nn.compact
    def __call__(self, observation, prev_action=None, prev_reward=None):
        # BlockedFrames: the replay already produced the BATCH-MINOR
        # blocked-row [K, Hb, Wb, s*s, N] conv input (same params as
        # the raw path; replay/frame.py:_obs_pair_blocked).
        pre_blocked = isinstance(observation, BlockedFrames)
        if pre_blocked:
            img = observation.data
            assert img.ndim == 5, "BlockedFrames carry [K,Hb,Wb,ss,N]"
            lead_dim, T, B = 1, 1, img.shape[-1]
        else:
            lead_dim, T, B, img_shape = infer_leading_dims(observation, 3)
            img = observation.reshape((T * B,) + img_shape)
        # uint8 stays uint8 through the layout change; scaling folds
        # into the first conv's fused input (models/conv.py).
        x = Conv2dModel(self.channels, self.kernel_sizes, self.strides,
                        self.paddings, compute_dtype=self.compute_dtype,
                        space_to_depth=self.space_to_depth,
                        input_scale=1.0 / self.obs_divisor,
                        pre_blocked=pre_blocked,
                        batch_minor_out=True)(img)
        bm = x.ndim == 2                 # batch-minor [F, N] trunk out
        if not bm:
            x = x.reshape(T * B, -1)
        if self.dueling:
            q = DuelingHead(self.fc_sizes, self.n_actions,
                            self.compute_dtype, batch_minor_input=bm)(x)
        else:
            q = MlpModel(self.fc_sizes, self.n_actions,
                         compute_dtype=self.compute_dtype,
                         batch_minor_input=bm)(x)
        return restore_leading_dims(q, lead_dim, T, B)


class AtariCatDqnModel(nn.Module):
    """Distributional (C51) model: softmax over atoms
    (rlpyt/models/dqn/atari_catdqn_model.py ~L15)."""

    n_actions: int
    n_atoms: int = 51
    fc_sizes: Sequence[int] = (512,)
    dueling: bool = False
    channels: Sequence[int] = ATARI_CHANNELS
    kernel_sizes: Sequence[int] = ATARI_KERNELS
    strides: Sequence[int] = ATARI_STRIDES
    paddings: Sequence[int] = ATARI_PADDINGS
    obs_divisor: float = 255.0  # 1.0 for binary MinAtar planes
    compute_dtype: jnp.dtype = jnp.float32
    space_to_depth: bool = True  # exact-math MXU-friendly first conv

    @nn.compact
    def __call__(self, observation, prev_action=None, prev_reward=None):
        pre_blocked = isinstance(observation, BlockedFrames)
        if pre_blocked:
            img = observation.data
            assert img.ndim == 5, "BlockedFrames carry [K,Hb,Wb,ss,N]"
            lead_dim, T, B = 1, 1, img.shape[-1]
        else:
            lead_dim, T, B, img_shape = infer_leading_dims(observation, 3)
            img = observation.reshape((T * B,) + img_shape)
        # uint8 stays uint8 through the layout change; scaling folds
        # into the first conv's fused input (models/conv.py).
        x = Conv2dModel(self.channels, self.kernel_sizes, self.strides,
                        self.paddings, compute_dtype=self.compute_dtype,
                        space_to_depth=self.space_to_depth,
                        input_scale=1.0 / self.obs_divisor,
                        pre_blocked=pre_blocked,
                        batch_minor_out=True)(img)
        bm = x.ndim == 2                 # batch-minor [F, N] trunk out
        if not bm:
            x = x.reshape(T * B, -1)
        if self.dueling:
            logits = DistributionalDuelingHead(
                self.fc_sizes, self.n_actions, self.n_atoms,
                self.compute_dtype, batch_minor_input=bm)(x)
        else:
            logits = MlpModel(
                self.fc_sizes, self.n_actions * self.n_atoms,
                compute_dtype=self.compute_dtype,
                batch_minor_input=bm)(x)
            logits = logits.reshape(T * B, self.n_actions, self.n_atoms)
        p = jax.nn.softmax(logits, axis=-1)
        return restore_leading_dims(p, lead_dim, T, B)


class AtariR2d1Model(nn.Module):
    """Conv → LSTM(+prev action/reward) → (dueling) Q
    (rlpyt/models/dqn/atari_r2d1_model.py ~L15).

    ``__call__(obs, prev_action, prev_reward, rnn_state, done=None)``
    returns (q, next_rnn_state).  ``done`` ([T,B] or [B]) resets the rnn
    state at episode starts inside a training window; pass None at sampling
    time (the agent zeroes state itself on reset).
    """

    n_actions: int
    fc_sizes: Sequence[int] = (512,)
    lstm_size: int = 512
    lstm_impl: str = "scan"
    dueling: bool = True
    channels: Sequence[int] = ATARI_CHANNELS
    kernel_sizes: Sequence[int] = ATARI_KERNELS
    strides: Sequence[int] = ATARI_STRIDES
    paddings: Sequence[int] = ATARI_PADDINGS
    obs_divisor: float = 255.0  # 1.0 for binary MinAtar planes
    compute_dtype: jnp.dtype = jnp.float32
    space_to_depth: bool = True  # exact-math MXU-friendly first conv

    @nn.compact
    def __call__(self, observation, prev_action, prev_reward,
                 rnn_state: RnnState, done=None):
        lead_dim, T, B, img_shape = infer_leading_dims(observation, 3)
        img = observation.reshape((T * B,) + img_shape)
        # uint8 stays uint8 through the layout change; scaling folds
        # into the first conv's fused input (models/conv.py).
        x = Conv2dModel(self.channels, self.kernel_sizes, self.strides,
                        self.paddings, compute_dtype=self.compute_dtype,
                        space_to_depth=self.space_to_depth,
                        input_scale=1.0 / self.obs_divisor)(img)
        x = x.reshape(T, B, -1)
        pa = jax.nn.one_hot(prev_action.reshape(T, B), self.n_actions,
                            dtype=x.dtype)
        pr = prev_reward.reshape(T, B, 1).astype(x.dtype)
        lstm_in = jnp.concatenate([x, pa, pr], axis=-1)
        if done is None:
            done_tb = jnp.zeros((T, B), jnp.bool_)
        else:
            done_tb = done.reshape(T, B)
        y, next_state = LstmCore(self.lstm_size, self.lstm_impl)(
            lstm_in, done_tb, rnn_state)
        y = y.reshape(T * B, -1)
        if self.dueling:
            q = DuelingHead(self.fc_sizes, self.n_actions,
                            self.compute_dtype)(y)
        else:
            q = MlpModel(self.fc_sizes, self.n_actions,
                         compute_dtype=self.compute_dtype)(y)
        return restore_leading_dims(q, lead_dim, T, B), next_state


class DqnMlpModel(nn.Module):
    """MLP Q-network for vector observations (the reference pairs MlpModel
    with DqnAgent for non-image envs; this adapter gives it the standard
    (obs, prev_action, prev_reward) model signature)."""

    n_actions: int
    hidden_sizes: Sequence[int] = (256, 256)
    dueling: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, observation, prev_action=None, prev_reward=None):
        # Accepts a bare array or a pytree (Composite/dict) observation:
        # pytree leaves are flattened and concatenated on the feature
        # axis (rlpyt models consumed Composite observations the same
        # way through namedarraytuple leaves).
        lead_dim, T, B, x = infer_leading_dims_tree(observation, 1)
        if self.dueling:
            q = DuelingHead(self.hidden_sizes, self.n_actions,
                            self.compute_dtype)(x)
        else:
            q = MlpModel(self.hidden_sizes, self.n_actions,
                         compute_dtype=self.compute_dtype)(x)
        return restore_leading_dims(q, lead_dim, T, B)


class R2d1MlpModel(nn.Module):
    """MLP → LSTM → (dueling) Q for vector observations — the small-scale
    analogue of AtariR2d1Model used for unit tests and non-image envs."""

    n_actions: int
    hidden_sizes: Sequence[int] = (64,)
    lstm_size: int = 64
    lstm_impl: str = "scan"
    dueling: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, observation, prev_action, prev_reward,
                 rnn_state: RnnState, done=None):
        lead_dim, T, B, obs_shape = infer_leading_dims(observation, 1)
        x = observation.reshape(T, B, obs_shape[0]).astype(jnp.float32)
        x = MlpModel(self.hidden_sizes,
                     compute_dtype=self.compute_dtype)(x)
        pa = jax.nn.one_hot(prev_action.reshape(T, B), self.n_actions,
                            dtype=x.dtype)
        pr = prev_reward.reshape(T, B, 1).astype(x.dtype)
        lstm_in = jnp.concatenate([x, pa, pr], axis=-1)
        done_tb = (jnp.zeros((T, B), jnp.bool_) if done is None
                   else done.reshape(T, B))
        y, next_state = LstmCore(self.lstm_size, self.lstm_impl)(
            lstm_in, done_tb, rnn_state)
        y = y.reshape(T * B, -1)
        if self.dueling:
            q = DuelingHead(self.hidden_sizes, self.n_actions,
                            self.compute_dtype)(y)
        else:
            q = MlpModel(self.hidden_sizes, self.n_actions,
                         compute_dtype=self.compute_dtype)(y)
        return restore_leading_dims(q, lead_dim, T, B), next_state
