"""DQN (reference: rlpyt/algos/dqn/dqn.py:DQN ~L20-280).

Capability parity: uniform or prioritized HBM replay, n-step returns,
Double-DQN targets, Huber ``delta_clip``, PER importance weighting +
priority write-back, target net update by interval (hard) or tau (polyak),
``min_steps_learn`` warmup, ``replay_ratio``-derived updates-per-iteration.
Dueling is a model flag (as in the reference).  Everything runs inside one
jitted program: append → K×(sample → loss → grad → step → priorities) →
maybe target update, with the K-update loop a ``lax.scan``.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from rlpyt_tpu.algos.base import RlAlgorithm, global_norm, make_optimizer
from rlpyt_tpu.ops.value import huber_loss, polyak_update
from rlpyt_tpu.replay.base import SamplesToBuffer
from rlpyt_tpu.replay.prioritized import PrioritizedReplayBuffer
from rlpyt_tpu.replay.uniform import UniformReplayBuffer
from rlpyt_tpu.samplers.rollout import Samples
from rlpyt_tpu.struct import tree_index, select_at_indexes, valid_mean


class DqnTrainState(NamedTuple):
    params: Any
    target_params: Any
    opt_state: Any
    update_counter: jax.Array


class OptInfo(NamedTuple):
    loss: jax.Array
    grad_norm: jax.Array
    td_abs_err: jax.Array


class DQN(RlAlgorithm):
    def __init__(
        self,
        discount: float = 0.99,
        batch_size: int = 32,
        min_steps_learn: int = int(5e4),
        delta_clip: float = 1.0,
        replay_size: int = int(1e6),
        replay_ratio: float = 8.0,
        target_update_interval: int = 312,
        target_update_tau: float = 1.0,
        n_step_return: int = 1,
        learning_rate: float = 2.5e-4,
        clip_grad_norm: float = 10.0,
        double_dqn: bool = False,
        prioritized_replay: bool = False,
        pri_alpha: float = 0.6,
        pri_beta: float = 0.4,
        frame_buffer: bool = False,
        frames_per_obs: int = 4,
        blocked_frame_sampling: bool = False,
        window_gather_kernel: bool = False,
        optim: str = "adam",
        optim_kwargs: dict | None = None,
        pallas_frame_gather: bool | None = None,
    ):
        self.discount = discount
        self.batch_size = batch_size
        self.min_steps_learn = min_steps_learn
        self.delta_clip = delta_clip
        self.replay_size = replay_size
        self.replay_ratio = replay_ratio
        self.target_update_interval = target_update_interval
        self.target_update_tau = target_update_tau
        self.n_step = n_step_return
        self.learning_rate = learning_rate
        self.clip_grad_norm = clip_grad_norm
        self.double_dqn = double_dqn
        self.prioritized_replay = prioritized_replay
        self.pri_alpha = pri_alpha
        self.pri_beta = pri_beta
        self.frame_buffer = frame_buffer
        self.frames_per_obs = frames_per_obs
        if pallas_frame_gather is not None:
            # Deprecated alias: the shipped path is the blocked-row XLA
            # gather (replay/frame.py blocked_s2d), not the experimental
            # Pallas kernel, so the old name was misleading.
            import warnings
            warnings.warn(
                "pallas_frame_gather is deprecated; use "
                "blocked_frame_sampling (the shipped path is the "
                "blocked-row XLA gather)", DeprecationWarning,
                stacklevel=2)
            blocked_frame_sampling = pallas_frame_gather
        self.blocked_frame_sampling = blocked_frame_sampling
        # Opt-in Pallas Element-window replay sampling (requires
        # blocked_frame_sampling; ops/pallas/window_gather.py).
        # EXPERIMENTAL: bit-exact vs the default path but measured
        # SLOWER at the flagship geometry (kernel module docstring);
        # keep False unless re-measuring on a newer toolchain.
        self.window_gather_kernel = window_gather_kernel
        assert not window_gather_kernel or blocked_frame_sampling, (
            "window_gather_kernel requires blocked_frame_sampling")
        self.optim = optim
        self.optim_kwargs = dict(optim_kwargs or {})

    # ------------------------------------------------------------------

    def initialize(self, agent, batch_spec, example_obs, key, n_itr=1):
        """Build TrainState + replay (rlpyt DQN.initialize ~L90: selects
        ReplayCls, sizes updates_per_optimize from replay_ratio)."""
        self.agent = agent
        self.batch_spec = batch_spec
        self.updates_per_optimize = max(
            1, int(self.replay_ratio * batch_spec.size / self.batch_size))
        # Adam default: rlpyt's eps=0.01/batch_size; RMSprop (the
        # published MinAtar-DQN optimizer) takes its eps/decay/centered
        # from optim_kwargs.
        okw = dict(self.optim_kwargs)
        if self.optim == "adam":
            okw.setdefault("eps", 0.01 / self.batch_size)
        self.optimizer = make_optimizer(
            self.learning_rate, self.clip_grad_norm, self.optim, **okw)

        params = agent.init(key, example_obs)
        from rlpyt_tpu.struct import tree_copy
        train_state = DqnTrainState(
            params=params,
            target_params=tree_copy(params),
            opt_state=self.optimizer.init(params),
            update_counter=jnp.zeros((), jnp.int32),
        )
        # ReplayCls selection over (uniform|prioritized) × (flat|frame)
        # (rlpyt DQN.initialize ReplayCls table ~L100).
        if self.frame_buffer:
            from rlpyt_tpu.replay.frame import (
                PrioritizedFrameReplayBuffer,
                UniformFrameReplayBuffer,
            )
            ReplayCls = (PrioritizedFrameReplayBuffer
                         if self.prioritized_replay
                         else UniformFrameReplayBuffer)
        else:
            ReplayCls = (PrioritizedReplayBuffer if self.prioritized_replay
                         else UniformReplayBuffer)
        kwargs = dict(size=self.replay_size, B=batch_spec.B,
                      sample_T=batch_spec.T, discount=self.discount,
                      n_step_return=self.n_step)
        if self.prioritized_replay:
            kwargs.update(alpha=self.pri_alpha, beta=self.pri_beta)
        if self.frame_buffer:
            kwargs.update(frames_per_obs=self.frames_per_obs)
            if self.blocked_frame_sampling:
                # Blocked-row sampling emits the model's space-to-depth
                # layout; needs the model's first-layer stride (same
                # params serve raw rollout obs and blocked replay obs).
                model = agent.model
                assert getattr(model, "space_to_depth", False), (
                    "blocked_frame_sampling requires a space_to_depth "
                    "model (models/conv.py)")
                k0 = int(model.kernel_sizes[0])
                s0 = int(model.strides[0])
                p0 = int((model.paddings or [0])[0])
                assert s0 > 1 and k0 % s0 == 0 and p0 == 0, (
                    "blocked_frame_sampling requires an s2d-able first "
                    f"conv: stride>1, kernel % stride == 0, padding 0 "
                    f"(got k={k0}, s={s0}, p={p0})")
                kwargs.update(blocked_s2d=s0,
                              window_kernel=self.window_gather_kernel)
        self.replay = ReplayCls(**kwargs)

        example = SamplesToBuffer(
            observation=tree_index(example_obs, 0),
            action=agent.env_spaces.action.null_value(),
            reward=jnp.zeros((), jnp.float32),
            done=jnp.zeros((), jnp.bool_),
            timeout=jnp.zeros((), jnp.bool_),
        )
        replay_state = self.replay.init(example)
        return train_state, replay_state

    def samples_to_buffer(self, samples: Samples) -> SamplesToBuffer:
        """(rlpyt DQN.samples_to_buffer ~L180)."""
        timeout = samples.env_info.get(
            "timeout", jnp.zeros_like(samples.done))
        return SamplesToBuffer(
            observation=samples.observation,
            action=samples.action,
            reward=samples.reward,
            done=samples.done,
            timeout=timeout,
        )

    # ------------------------------------------------------------------

    def loss(self, params, target_params, batch) -> Tuple[jax.Array, jax.Array]:
        """TD loss (rlpyt DQN.loss ~L220).  Returns (scalar, |δ|)."""
        qs = self.agent.q(params, *batch.agent_inputs)
        q = select_at_indexes(batch.action, qs)

        target_qs = self.agent.q(target_params, *batch.target_inputs)
        if self.double_dqn:
            online_next = self.agent.q(params, *batch.target_inputs)
            next_a = jnp.argmax(online_next, axis=-1)
            next_q = select_at_indexes(next_a, target_qs)
        else:
            next_q = jnp.max(target_qs, axis=-1)
        disc = self.discount ** self.n_step
        y = batch.return_ + disc * (
            1.0 - batch.done_n.astype(jnp.float32)) * next_q
        delta = y - q
        losses = huber_loss(delta, self.delta_clip)
        # Time-limit truncations have no valid bootstrap obs: mask them.
        valid = 1.0 - batch.timeout_n.astype(jnp.float32)
        losses = losses * batch.is_weights * valid
        td_abs = jnp.abs(jax.lax.stop_gradient(delta)) * valid
        return valid_mean(losses, valid), td_abs

    def _one_update(self, train_state: DqnTrainState, replay_state, key):
        batch = self.replay.sample(replay_state, key, self.batch_size)
        (loss, td_abs), grads = jax.value_and_grad(
            self.loss, has_aux=True)(
                train_state.params, train_state.target_params, batch)
        updates, opt_state = self.optimizer.update(
            grads, train_state.opt_state, train_state.params)
        params = optax.apply_updates(train_state.params, updates)
        counter = train_state.update_counter + 1
        # Target update: interval (hard) or polyak each step (tau < 1).
        if self.target_update_tau < 1.0:
            target = polyak_update(train_state.target_params, params,
                                   self.target_update_tau)
        else:
            target = jax.tree.map(
                lambda t, o: jnp.where(
                    counter % self.target_update_interval == 0, o, t),
                train_state.target_params, params)
        replay_state = self.replay.update_priorities(
            replay_state, batch.indices, td_abs)
        new_state = DqnTrainState(params, target, opt_state, counter)
        info = OptInfo(loss=loss, grad_norm=global_norm(grads),
                       td_abs_err=jnp.mean(td_abs))
        return new_state, replay_state, info

    def optimize(self, train_state: DqnTrainState, replay_state,
                 samples: Samples, key, rollout_state):
        """Append → maybe K updates (rlpyt DQN.optimize_agent ~L150)."""
        cum_steps = rollout_state.cum_steps
        replay_state = self.replay.append(
            replay_state, self.samples_to_buffer(samples))

        def do_updates(operand):
            train_state, replay_state = operand

            def body(carry, k):
                ts, rs = carry
                ts, rs, info = self._one_update(ts, rs, k)
                return (ts, rs), info

            keys = jax.random.split(key, self.updates_per_optimize)
            (train_state, replay_state), infos = jax.lax.scan(
                body, (train_state, replay_state), keys)
            info = jax.tree.map(jnp.mean, infos)
            return train_state, replay_state, info

        def skip(operand):
            train_state, replay_state = operand
            zero = jnp.zeros((), jnp.float32)
            return train_state, replay_state, OptInfo(zero, zero, zero)

        return jax.lax.cond(
            cum_steps >= self.min_steps_learn, do_updates, skip,
            (train_state, replay_state))
