"""Policy-gradient algorithms (reference: rlpyt/algos/pg/base.py:
PolicyGradientAlgo, a2c.py:A2C, ppo.py:PPO).

A2C: one grad step per sampled batch on
  −logπ(a)·adv + value_coeff·MSE(V, return) − entropy_coeff·H.
PPO: epochs × shuffled minibatches of the clipped surrogate with linear LR
annealing to 0 over n_itr.  Feedforward PPO permutes over [T*B]; recurrent
PPO minibatches over B only, replaying the LSTM from the stored
``prev_rnn_state`` at window start with done-masked resets — exactly the
reference's recurrent path (rlpyt/algos/pg/ppo.py ~L120).

Advantage processing (γ-returns or GAE(λ), optional advantage
normalization, validity masking from done) follows
rlpyt/algos/pg/base.py:process_returns ~L40.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from rlpyt_tpu.algos.base import RlAlgorithm, global_norm, make_optimizer
from rlpyt_tpu.ops.returns import (
    discount_return,
    generalized_advantage_estimation,
    valid_from_done,
)
from rlpyt_tpu.samplers.rollout import Samples
from rlpyt_tpu.struct import valid_mean


class PgTrainState(NamedTuple):
    params: Any
    opt_state: Any
    update_counter: jax.Array


class PgOptInfo(NamedTuple):
    loss: jax.Array
    grad_norm: jax.Array
    entropy: jax.Array
    perplexity: jax.Array


class PolicyGradientAlgo(RlAlgorithm):
    bootstrap_value = True

    def __init__(
        self,
        discount: float = 0.99,
        learning_rate: float = 1e-3,
        value_loss_coeff: float = 0.5,
        entropy_loss_coeff: float = 0.01,
        clip_grad_norm: float = 1.0,
        gae_lambda: float = 1.0,
        normalize_advantage: bool = False,
    ):
        self.discount = discount
        self.learning_rate = learning_rate
        self.value_loss_coeff = value_loss_coeff
        self.entropy_loss_coeff = entropy_loss_coeff
        self.clip_grad_norm = clip_grad_norm
        self.gae_lambda = gae_lambda
        self.normalize_advantage = normalize_advantage

    def _make_optimizer(self, n_itr):
        return make_optimizer(self.learning_rate, self.clip_grad_norm)

    def initialize(self, agent, batch_spec, example_obs, key, n_itr=1):
        self.agent = agent
        self.batch_spec = batch_spec
        self.n_itr = n_itr
        self.optimizer = self._make_optimizer(n_itr)
        params = agent.init(key, example_obs)
        train_state = PgTrainState(
            params=params,
            opt_state=self.optimizer.init(params),
            update_counter=jnp.zeros((), jnp.int32),
        )
        return train_state, None  # PG has no replay

    # ------------------------------------------------------------------

    def bootstrap(self, params, rollout_state):
        """V(s_T) from the post-rollout observation (the reference stores
        this into samples as ``bootstrap_value`` during sampling)."""
        if self.agent.recurrent:
            return self.agent.value(
                params, rollout_state.observation,
                rollout_state.prev_action, rollout_state.prev_reward,
                rollout_state.agent_carry)
        return self.agent.value(params, rollout_state.observation,
                                rollout_state.prev_action,
                                rollout_state.prev_reward)

    def process_returns(self, samples: Samples, bootstrap_value, mid_batch_reset=True):
        """(rlpyt/algos/pg/base.py:process_returns ~L40)."""
        reward, done = samples.reward, samples.done
        value = samples.agent_info["value"]
        if self.gae_lambda == 1.0:
            return_ = discount_return(reward, done, bootstrap_value,
                                      self.discount)
            advantage = return_ - value
        else:
            advantage, return_ = generalized_advantage_estimation(
                reward, value, done, bootstrap_value, self.discount,
                self.gae_lambda)
        if mid_batch_reset:
            valid = None  # all samples valid (reset occurs mid-batch)
        else:
            valid = valid_from_done(done)
        if self.normalize_advantage:
            m = valid_mean(advantage, valid)
            v = valid_mean((advantage - m) ** 2, valid)
            advantage = (advantage - m) * jax.lax.rsqrt(v + 1e-8)
        return return_, advantage, valid

    @staticmethod
    def shifted_done(done):
        """done[t-1] — resets the rnn state used FOR step t when replaying
        an LSTM through a training window."""
        return jnp.concatenate(
            [jnp.zeros_like(done[:1]), done[:-1]], axis=0)


class A2C(PolicyGradientAlgo):
    """(rlpyt/algos/pg/a2c.py:A2C ~L10)."""

    def __init__(self, learning_rate=1e-3, optim="rmsprop", **kwargs):
        super().__init__(learning_rate=learning_rate, **kwargs)
        self.optim = optim

    def _make_optimizer(self, n_itr):
        return make_optimizer(self.learning_rate, self.clip_grad_norm,
                              optim=self.optim)

    def loss(self, params, samples: Samples, bootstrap_value, init_rnn_state):
        if self.agent.recurrent:
            dist_info, value, _ = self.agent(
                params, samples.observation, samples.prev_action,
                samples.prev_reward, init_rnn_state,
                done=self.shifted_done(samples.done))
        else:
            dist_info, value = self.agent(
                params, samples.observation, samples.prev_action,
                samples.prev_reward)
        return_, advantage, valid = self.process_returns(
            samples, bootstrap_value)
        dist = self.agent.distribution
        logli = dist.log_likelihood(samples.action, dist_info)
        pi_loss = -valid_mean(logli * jax.lax.stop_gradient(advantage),
                              valid)
        value_error = 0.5 * (value - return_) ** 2
        value_loss = self.value_loss_coeff * valid_mean(value_error, valid)
        entropy = dist.mean_entropy(dist_info, valid)
        entropy_loss = -self.entropy_loss_coeff * entropy
        loss = pi_loss + value_loss + entropy_loss
        return loss, (entropy, dist.perplexity(dist_info).mean())

    def optimize(self, train_state: PgTrainState, replay_state,
                 samples: Samples, key, rollout_state):
        bootstrap_value = jax.lax.stop_gradient(
            self.bootstrap(train_state.params, rollout_state))
        init_rnn_state = (samples.agent_info.get("prev_rnn_state")
                          and jax.tree.map(
                              lambda x: x[0],
                              samples.agent_info["prev_rnn_state"]))
        (loss, (entropy, perplexity)), grads = jax.value_and_grad(
            self.loss, has_aux=True)(
                train_state.params, samples, bootstrap_value,
                init_rnn_state)
        updates, opt_state = self.optimizer.update(
            grads, train_state.opt_state, train_state.params)
        params = optax.apply_updates(train_state.params, updates)
        info = PgOptInfo(loss=loss, grad_norm=global_norm(grads),
                         entropy=entropy, perplexity=perplexity)
        return (PgTrainState(params, opt_state,
                             train_state.update_counter + 1),
                replay_state, info)


class PPO(PolicyGradientAlgo):
    """(rlpyt/algos/pg/ppo.py:PPO ~L15)."""

    def __init__(
        self,
        learning_rate: float = 3e-4,
        epochs: int = 4,
        minibatches: int = 4,
        ratio_clip: float = 0.1,
        linear_lr_schedule: bool = True,
        value_clip: float | None = None,
        gae_lambda: float = 0.98,
        normalize_advantage: bool = False,
        **kwargs,
    ):
        super().__init__(learning_rate=learning_rate,
                         gae_lambda=gae_lambda,
                         normalize_advantage=normalize_advantage, **kwargs)
        self.epochs = epochs
        self.minibatches = minibatches
        self.ratio_clip = ratio_clip
        self.linear_lr_schedule = linear_lr_schedule
        self.value_clip = value_clip

    def _make_optimizer(self, n_itr):
        if self.linear_lr_schedule:
            total_updates = n_itr * self.epochs * self.minibatches
            schedule = optax.linear_schedule(
                self.learning_rate, 0.0, max(total_updates, 1))
            return make_optimizer(self.learning_rate, self.clip_grad_norm,
                                  schedule=schedule)
        return make_optimizer(self.learning_rate, self.clip_grad_norm)

    # ------------------------------------------------------------------

    def _surrogate_loss(self, params, mb, valid):
        """Clipped-surrogate + value + entropy on one minibatch.

        ``mb`` leaves are [T, b, ...] (recurrent keeps the time axis; FF
        arrives flattened to [n, ...] with T=n, b absent)."""
        if self.agent.recurrent:
            dist_info, value, _ = self.agent(
                params, mb["observation"], mb["prev_action"],
                mb["prev_reward"], mb["init_rnn_state"],
                done=mb["done_shifted"])
        else:
            dist_info, value = self.agent(
                params, mb["observation"], mb["prev_action"],
                mb["prev_reward"])
        dist = self.agent.distribution
        ratio = dist.likelihood_ratio(
            mb["action"], old_dist_info=mb["old_dist_info"],
            new_dist_info=dist_info)
        advantage = mb["advantage"]
        surr_1 = ratio * advantage
        clipped = jnp.clip(ratio, 1.0 - self.ratio_clip,
                           1.0 + self.ratio_clip)
        surr_2 = clipped * advantage
        pi_loss = -valid_mean(jnp.minimum(surr_1, surr_2), valid)
        value_error = 0.5 * (value - mb["return_"]) ** 2
        value_loss = self.value_loss_coeff * valid_mean(value_error, valid)
        entropy = dist.mean_entropy(dist_info, valid)
        loss = pi_loss + value_loss - self.entropy_loss_coeff * entropy
        return loss, (entropy, dist.perplexity(dist_info).mean())

    def optimize(self, train_state: PgTrainState, replay_state,
                 samples: Samples, key, rollout_state):
        T, B = self.batch_spec
        bootstrap_value = jax.lax.stop_gradient(
            self.bootstrap(train_state.params, rollout_state))
        return_, advantage, valid = self.process_returns(
            samples, bootstrap_value)

        data = {
            "observation": samples.observation,
            "prev_action": samples.prev_action,
            "prev_reward": samples.prev_reward,
            "action": samples.action,
            "old_dist_info": samples.agent_info["dist_info"],
            "return_": return_,
            "advantage": advantage,
        }

        recurrent = self.agent.recurrent
        if recurrent:
            data["done_shifted"] = self.shifted_done(samples.done)
            data["init_rnn_state"] = jax.tree.map(
                lambda x: x[0], samples.agent_info["prev_rnn_state"])
            n_items = B           # minibatch over envs only
            batch_axis = 1
            mb_size = B // self.minibatches
            if valid is None:
                valid = jnp.ones((T, B), jnp.float32)
        else:
            data = jax.tree.map(
                lambda x: x.reshape((T * B,) + x.shape[2:]), data)
            n_items = T * B
            batch_axis = 0
            mb_size = (T * B) // self.minibatches
            if valid is None:
                valid = jnp.ones((T * B,), jnp.float32)
            else:
                valid = valid.reshape(T * B)

        grad_fn = jax.value_and_grad(self._surrogate_loss, has_aux=True)

        init_rnn_state = data.pop("init_rnn_state", None)

        def one_minibatch(carry, idxs):
            params, opt_state, counter = carry
            if recurrent:
                mb = jax.tree.map(lambda x: jnp.take(x, idxs, axis=1), data)
                # init_rnn_state leaves are [B, H] — env axis is 0 there.
                mb["init_rnn_state"] = jax.tree.map(
                    lambda x: jnp.take(x, idxs, axis=0), init_rnn_state)
                mb_valid = jnp.take(valid, idxs, axis=1)
            else:
                mb = jax.tree.map(lambda x: jnp.take(x, idxs, axis=0), data)
                mb_valid = jnp.take(valid, idxs, axis=0)
            (loss, aux), grads = grad_fn(params, mb, mb_valid)
            updates, opt_state = self.optimizer.update(grads, opt_state,
                                                       params)
            params = optax.apply_updates(params, updates)
            return ((params, opt_state, counter + 1),
                    (loss, global_norm(grads), *aux))

        def one_epoch(carry, k):
            perm = jax.random.permutation(k, n_items)
            idxs = perm[: self.minibatches * mb_size].reshape(
                self.minibatches, mb_size)
            return jax.lax.scan(one_minibatch, carry, idxs)

        keys = jax.random.split(key, self.epochs)
        (params, opt_state, counter), infos = jax.lax.scan(
            one_epoch, (train_state.params, train_state.opt_state,
                        train_state.update_counter), keys)
        loss, gn, entropy, perplexity = jax.tree.map(jnp.mean, infos)
        info = PgOptInfo(loss=loss, grad_norm=gn, entropy=entropy,
                         perplexity=perplexity)
        return PgTrainState(params, opt_state, counter), replay_state, info
