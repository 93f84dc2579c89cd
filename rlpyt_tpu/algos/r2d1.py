"""R2D1 — Recurrent Replay Distributed DQN, single-machine flavor
(reference: rlpyt/algos/dqn/r2d1.py:R2D1 ~L20-250).

Parity features:
- prioritized sequence replay with warmup_T burn-in + batch_T training
  windows and stored window-start rnn state (replay/sequence.py);
- burn-in: the LSTM is re-materialized over the warmup slice with
  gradients stopped, mitigating stale stored states;
- value rescaling h / h⁻¹ around the n-step targets (ops/value.py);
- sequence priorities η·max|δ| + (1−η)·mean|δ|;
- optional input priorities at insert from collection-time TD errors;
- Double-DQN action selection, per-env vector ε exploration (agent side).

The whole update — window gather, two-stream (online/target) LSTM
re-materialization, n-step rescaled targets, priority write-back — is one
fused jitted program over [W, b] windows.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from rlpyt_tpu.algos.base import RlAlgorithm, global_norm, make_optimizer
from rlpyt_tpu.algos.dqn import DqnTrainState, OptInfo
from rlpyt_tpu.ops.returns import discount_return_n_step, valid_from_done
from rlpyt_tpu.ops.value import (
    huber_loss,
    polyak_update,
    value_rescale,
    value_rescale_inv,
)
from rlpyt_tpu.replay.base import SamplesToBuffer
from rlpyt_tpu.replay.sequence import (
    PrioritizedSequenceFrameReplayBuffer,
    PrioritizedSequenceReplayBuffer,
    SequenceSamples,
    UniformSequenceFrameReplayBuffer,
    UniformSequenceReplayBuffer,
)
from rlpyt_tpu.samplers.rollout import Samples
from rlpyt_tpu.struct import tree_index, select_at_indexes, valid_mean


class R2D1(RlAlgorithm):
    def __init__(
        self,
        discount: float = 0.997,
        batch_b: int = 64,          # sequences per update
        batch_T: int = 80,          # training length
        warmup_T: int = 40,         # burn-in length
        min_steps_learn: int = int(1e5),
        delta_clip: float | None = None,
        replay_size: int = int(1e6),
        replay_ratio: float = 1.0,
        target_update_interval: int = 2500,
        n_step_return: int = 5,
        learning_rate: float = 1e-4,
        clip_grad_norm: float = 80.0,
        double_dqn: bool = True,
        prioritized_replay: bool = True,
        pri_alpha: float = 0.6,
        pri_beta: float = 0.9,
        pri_eta: float = 0.9,
        input_priorities: bool = True,
        value_scale_eps: float = 1e-3,
        use_value_rescale: bool = True,
        frame_compress: bool = False,
        frames_per_obs: int = 4,
        mask_after_done: bool = False,
        zero_state_init: bool = False,
    ):
        self.discount = discount
        self.batch_b = batch_b
        self.batch_T = batch_T
        self.warmup_T = warmup_T
        self.min_steps_learn = min_steps_learn
        self.delta_clip = delta_clip
        self.replay_size = replay_size
        self.replay_ratio = replay_ratio
        self.target_update_interval = target_update_interval
        self.n_step = n_step_return
        self.learning_rate = learning_rate
        self.clip_grad_norm = clip_grad_norm
        self.double_dqn = double_dqn
        self.prioritized_replay = prioritized_replay
        self.pri_alpha = pri_alpha
        self.pri_beta = pri_beta
        self.pri_eta = pri_eta
        self.input_priorities = input_priorities
        self.value_scale_eps = value_scale_eps
        # Ablation knob: h/h⁻¹ were designed for raw-Atari reward
        # scales; at MinAtar scale the compression may cost more than
        # it buys.  False ⇒ identity transforms (plain n-step targets).
        self.use_value_rescale = use_value_rescale
        self.frame_compress = frame_compress
        self.frames_per_obs = frames_per_obs
        # rlpyt masks every step after the first done in the training
        # slice (algos/dqn/r2d1.py valid_from_done) because its LSTM
        # state is NOT reset mid-window, so post-done context is wrong.
        # Here the model resets the recurrence at in-window episode
        # starts (done_shifted → LstmCore per-step reset), making
        # post-done steps fully trainable — on short-episode envs
        # (MinAtar: ~16-step episodes vs 40-step slices) rlpyt's mask
        # discards most of the batch.  Default trains all steps;
        # set mask_after_done=True for strict reference behavior.
        self.mask_after_done = mask_after_done
        self.zero_state_init = zero_state_init

    def _h(self, x):
        return (value_rescale(x, self.value_scale_eps)
                if self.use_value_rescale else x)

    def _h_inv(self, x):
        return (value_rescale_inv(x, self.value_scale_eps)
                if self.use_value_rescale else x)

    # ------------------------------------------------------------------

    def initialize(self, agent, batch_spec, example_obs, key, n_itr=1):
        self.agent = agent
        self.batch_spec = batch_spec
        update_batch_size = self.batch_b * self.batch_T
        self.updates_per_optimize = max(
            1, int(self.replay_ratio * batch_spec.size / update_batch_size))
        self.optimizer = make_optimizer(
            self.learning_rate, self.clip_grad_norm, "adam", eps=1e-3)

        params = agent.init(key, example_obs)
        from rlpyt_tpu.struct import tree_copy
        train_state = DqnTrainState(
            params=params, target_params=tree_copy(params),
            opt_state=self.optimizer.init(params),
            update_counter=jnp.zeros((), jnp.int32))

        if self.frame_compress:
            Cls = (PrioritizedSequenceFrameReplayBuffer
                   if self.prioritized_replay
                   else UniformSequenceFrameReplayBuffer)
        else:
            Cls = (PrioritizedSequenceReplayBuffer
                   if self.prioritized_replay
                   else UniformSequenceReplayBuffer)
        kwargs = dict(
            size=self.replay_size, B=batch_spec.B,
            sample_T=batch_spec.T, warmup_T=self.warmup_T,
            batch_T=self.batch_T, n_step_return=self.n_step,
            discount=self.discount)
        if self.frame_compress:
            kwargs.update(frames_per_obs=self.frames_per_obs)
        if self.prioritized_replay:
            kwargs.update(alpha=self.pri_alpha, beta=self.pri_beta)
        self.replay = Cls(**kwargs)

        example = SamplesToBuffer(
            observation=tree_index(example_obs, 0),
            action=agent.env_spaces.action.null_value(),
            reward=jnp.zeros((), jnp.float32),
            done=jnp.zeros((), jnp.bool_),
            timeout=jnp.zeros((), jnp.bool_))
        h = jnp.zeros((agent.lstm_size,), jnp.float32)
        replay_state = self.replay.init(example, (h, h))
        return train_state, replay_state

    # ------------------------------------------------------------------

    def samples_to_buffer(self, samples: Samples):
        timeout = samples.env_info.get("timeout",
                                       jnp.zeros_like(samples.done))
        to_buf = SamplesToBuffer(
            observation=samples.observation, action=samples.action,
            reward=samples.reward, done=samples.done, timeout=timeout)
        # rnn states at interval points within the block
        iv = self.replay.interval
        rnn = jax.tree.map(lambda x: x[::iv],
                           samples.agent_info["prev_rnn_state"])
        return to_buf, rnn

    def _input_priorities(self, samples: Samples) -> jax.Array:
        """Initial priorities from collection-time 1-step TD errors
        (rlpyt r2d1.py input_priorities, approximated over the inserted
        block): per interval-slot η·max|δ| + (1−η)·mean|δ|."""
        q = samples.agent_info["q"]          # [T, B, A]
        qa = select_at_indexes(samples.action, q)
        max_next = jnp.max(q, axis=-1)
        next_max = jnp.concatenate([max_next[1:], max_next[-1:]], axis=0)
        nonterminal = 1.0 - samples.done.astype(jnp.float32)
        target = self._h(
            samples.reward + self.discount * nonterminal
            * self._h_inv(next_max))
        delta = jnp.abs(target - qa)         # [T, B]
        iv = self.replay.interval
        T = delta.shape[0]
        blocks = delta.reshape(T // iv, iv, -1)
        return (self.pri_eta * blocks.max(axis=1)
                + (1 - self.pri_eta) * blocks.mean(axis=1))

    # ------------------------------------------------------------------

    def loss(self, params, target_params, batch: SequenceSamples
             ) -> Tuple[jax.Array, jax.Array]:
        """Sequence TD loss with burn-in + value rescaling
        (rlpyt r2d1.py:loss ~L150).  Returns (scalar, priorities [b])."""
        agent = self.agent
        wT, T, n = self.warmup_T, self.batch_T, self.n_step
        # done[t] ends episode at t ⇒ reset LSTM before t+1.
        done_shifted = jnp.concatenate(
            [jnp.zeros_like(batch.done[:1]), batch.done[:-1]], axis=0)

        def forward(p, obs_sl, pa_sl, pr_sl, dn_sl, state, stop_grad_state):
            q, next_state = agent.model.apply(
                p, obs_sl, pa_sl, pr_sl, state, dn_sl)
            if stop_grad_state:
                next_state = jax.lax.stop_gradient(next_state)
            return q, next_state

        def split(x, lo, hi):
            return jax.tree.map(lambda l: l[lo:hi], x)

        if self.zero_state_init:
            # Ablation knob: ignore the stored collection-time rnn state
            # and burn in from zeros (the R2D2 paper's zero-state
            # baseline; stored-state is the reference default).
            online_state = jax.tree.map(jnp.zeros_like,
                                        batch.init_rnn_state)
        else:
            online_state = batch.init_rnn_state
        target_state = online_state
        if wT > 0:
            _, online_state = forward(
                params, split(batch.observation, 0, wT),
                batch.prev_action[:wT], batch.prev_reward[:wT],
                done_shifted[:wT], online_state, True)
            _, target_state = forward(
                target_params, split(batch.observation, 0, wT),
                batch.prev_action[:wT], batch.prev_reward[:wT],
                done_shifted[:wT], target_state, True)

        W = wT + T + n
        q_full, _ = forward(
            params, split(batch.observation, wT, W),
            batch.prev_action[wT:W], batch.prev_reward[wT:W],
            done_shifted[wT:W], online_state, False)          # [T+n, b, A]
        qt_full, _ = forward(
            target_params, split(batch.observation, wT, W),
            batch.prev_action[wT:W], batch.prev_reward[wT:W],
            done_shifted[wT:W], target_state, False)

        q = select_at_indexes(batch.action[wT:wT + T], q_full[:T])
        if self.double_dqn:
            next_a = jnp.argmax(q_full[n:n + T], axis=-1)
            next_q = select_at_indexes(
                next_a, jax.lax.stop_gradient(qt_full[n:n + T]))
        else:
            next_q = jnp.max(jax.lax.stop_gradient(qt_full[n:n + T]),
                             axis=-1)

        # n-step rescaled targets over the training slice.
        rew = batch.reward[wT:wT + T + n - 1]
        dn = batch.done[wT:wT + T + n - 1]
        return_, done_n = discount_return_n_step(rew, dn, n, self.discount)
        disc = self.discount ** n
        nonterminal = 1.0 - done_n.astype(jnp.float32)
        y = self._h(
            return_ + disc * nonterminal * self._h_inv(next_q))
        delta = jax.lax.stop_gradient(y) - q

        if self.mask_after_done:
            valid = valid_from_done(batch.done[wT:wT + T])  # [T, b]
        else:
            valid = jnp.ones_like(batch.done[wT:wT + T],
                                  dtype=jnp.float32)
        if self.delta_clip is not None:
            losses = huber_loss(delta, self.delta_clip)
        else:
            losses = 0.5 * delta**2
        losses = losses * batch.is_weights[None, :]
        loss = valid_mean(losses, valid)

        abs_delta = jnp.abs(jax.lax.stop_gradient(delta)) * valid
        denom = jnp.maximum(valid.sum(axis=0), 1.0)
        priorities = (self.pri_eta * abs_delta.max(axis=0)
                      + (1 - self.pri_eta) * abs_delta.sum(axis=0) / denom)
        return loss, priorities

    def _one_update(self, train_state: DqnTrainState, replay_state, key):
        batch = self.replay.sample(replay_state, key, self.batch_b)
        (loss, priorities), grads = jax.value_and_grad(
            self.loss, has_aux=True)(
                train_state.params, train_state.target_params, batch)
        updates, opt_state = self.optimizer.update(
            grads, train_state.opt_state, train_state.params)
        params = optax.apply_updates(train_state.params, updates)
        counter = train_state.update_counter + 1
        target = jax.tree.map(
            lambda t, o: jnp.where(
                counter % self.target_update_interval == 0, o, t),
            train_state.target_params, params)
        replay_state = self.replay.update_priorities(
            replay_state, batch.slots, priorities)
        info = OptInfo(loss=loss, grad_norm=global_norm(grads),
                       td_abs_err=jnp.mean(priorities))
        return (DqnTrainState(params, target, opt_state, counter),
                replay_state, info)

    def optimize(self, train_state: DqnTrainState, replay_state,
                 samples: Samples, key, rollout_state):
        to_buf, rnn = self.samples_to_buffer(samples)
        in_pri = (self._input_priorities(samples)
                  if (self.input_priorities and self.prioritized_replay)
                  else None)
        replay_state = self.replay.append(replay_state, to_buf, rnn, in_pri)
        cum_steps = rollout_state.cum_steps

        def do_updates(operand):
            train_state, replay_state = operand

            def body(carry, k):
                ts, rs = carry
                ts, rs, info = self._one_update(ts, rs, k)
                return (ts, rs), info

            keys = jax.random.split(key, self.updates_per_optimize)
            (train_state, replay_state), infos = jax.lax.scan(
                body, (train_state, replay_state), keys)
            return train_state, replay_state, jax.tree.map(jnp.mean, infos)

        def skip(operand):
            train_state, replay_state = operand
            z = jnp.zeros((), jnp.float32)
            return train_state, replay_state, OptInfo(z, z, z)

        return jax.lax.cond(cum_steps >= self.min_steps_learn, do_updates,
                            skip, (train_state, replay_state))
