"""Q-value policy-gradient algorithms (reference:
rlpyt/algos/qpg/ddpg.py:DDPG, td3.py:TD3, sac.py:SAC).

All share the HBM uniform replay (time-limit aware via ``timeout_n``
masking) and the append → K×update loop structure of DQN.  SAC implements
the modern no-V-network formulation with automatic entropy-coefficient
tuning (learned log α against target_entropy = −dim(A)), matching
rlpyt/algos/qpg/sac.py ~L20-250.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from rlpyt_tpu.algos.base import RlAlgorithm, global_norm, make_optimizer
from rlpyt_tpu.ops.value import polyak_update
from rlpyt_tpu.replay.base import SamplesToBuffer
from rlpyt_tpu.replay.uniform import UniformReplayBuffer
from rlpyt_tpu.samplers.rollout import Samples
from rlpyt_tpu.struct import tree_index, tree_copy, valid_mean


class QpgTrainState(NamedTuple):
    params: Any          # dict pytree incl. target_* subtrees
    opt_states: Any      # dict of optax states keyed like params groups
    log_alpha: jax.Array  # SAC entropy coefficient (unused elsewhere)
    alpha_opt_state: Any
    update_counter: jax.Array


class QpgOptInfo(NamedTuple):
    q_loss: jax.Array
    pi_loss: jax.Array
    q_grad_norm: jax.Array
    pi_grad_norm: jax.Array
    alpha: jax.Array


class QpgBase(RlAlgorithm):
    """Shared replay/loop machinery for DDPG/TD3/SAC."""

    def __init__(
        self,
        discount: float = 0.99,
        batch_size: int = 256,
        min_steps_learn: int = int(1e4),
        replay_size: int = int(1e6),
        replay_ratio: float = 256.0,
        target_update_tau: float = 0.005,
        n_step_return: int = 1,
        learning_rate: float = 3e-4,
        q_learning_rate: float | None = None,
        clip_grad_norm: float | None = None,
    ):
        self.discount = discount
        self.batch_size = batch_size
        self.min_steps_learn = min_steps_learn
        self.replay_size = replay_size
        self.replay_ratio = replay_ratio
        self.target_update_tau = target_update_tau
        self.n_step = n_step_return
        self.learning_rate = learning_rate
        self.q_learning_rate = q_learning_rate or learning_rate
        self.clip_grad_norm = clip_grad_norm

    def initialize(self, agent, batch_spec, example_obs, key, n_itr=1):
        self.agent = agent
        self.batch_spec = batch_spec
        self.updates_per_optimize = max(
            1, int(self.replay_ratio * batch_spec.size / self.batch_size))
        self.pi_optimizer = make_optimizer(self.learning_rate,
                                           self.clip_grad_norm)
        self.q_optimizer = make_optimizer(self.q_learning_rate,
                                          self.clip_grad_norm)
        self.alpha_optimizer = make_optimizer(self.learning_rate, None)

        params = agent.init(key, example_obs)
        train_state = QpgTrainState(
            params=params,
            opt_states=self._init_opt_states(params),
            log_alpha=jnp.zeros((), jnp.float32),
            alpha_opt_state=self.alpha_optimizer.init(
                jnp.zeros((), jnp.float32)),
            update_counter=jnp.zeros((), jnp.int32),
        )
        self.replay = UniformReplayBuffer(
            size=self.replay_size, B=batch_spec.B, sample_T=batch_spec.T,
            discount=self.discount, n_step_return=self.n_step)
        example = SamplesToBuffer(
            observation=tree_index(example_obs, 0),
            action=agent.env_spaces.action.null_value(),
            reward=jnp.zeros((), jnp.float32),
            done=jnp.zeros((), jnp.bool_),
            timeout=jnp.zeros((), jnp.bool_),
        )
        return train_state, self.replay.init(example)

    def samples_to_buffer(self, samples: Samples) -> SamplesToBuffer:
        timeout = samples.env_info.get(
            "timeout", jnp.zeros_like(samples.done))
        return SamplesToBuffer(
            observation=samples.observation, action=samples.action,
            reward=samples.reward, done=samples.done, timeout=timeout)

    def optimize(self, train_state: QpgTrainState, replay_state,
                 samples: Samples, key, rollout_state):
        replay_state = self.replay.append(
            replay_state, self.samples_to_buffer(samples))
        cum_steps = rollout_state.cum_steps

        def do_updates(operand):
            train_state, replay_state = operand

            def body(ts, k):
                ts, info = self._one_update(ts, replay_state, k)
                return ts, info

            keys = jax.random.split(key, self.updates_per_optimize)
            train_state, infos = jax.lax.scan(body, train_state, keys)
            return train_state, replay_state, jax.tree.map(jnp.mean, infos)

        def skip(operand):
            train_state, replay_state = operand
            z = jnp.zeros((), jnp.float32)
            return (train_state, replay_state,
                    QpgOptInfo(z, z, z, z,
                               jnp.exp(train_state.log_alpha)))

        return jax.lax.cond(cum_steps >= self.min_steps_learn, do_updates,
                            skip, (train_state, replay_state))

    def _init_opt_states(self, params):
        raise NotImplementedError

    def _one_update(self, train_state, replay_state, key):
        raise NotImplementedError

    @staticmethod
    def _bootstrap_mask(batch):
        """(1-done_n) for the target, (1-timeout_n) validity for the loss."""
        nonterminal = 1.0 - batch.done_n.astype(jnp.float32)
        valid = 1.0 - batch.timeout_n.astype(jnp.float32)
        return nonterminal, valid


class DDPG(QpgBase):
    """(rlpyt/algos/qpg/ddpg.py:DDPG ~L15)."""

    def __init__(self, learning_rate=1e-4, q_learning_rate=1e-3,
                 target_update_tau=0.01, batch_size=64,
                 replay_ratio=64.0, **kwargs):
        super().__init__(learning_rate=learning_rate,
                         q_learning_rate=q_learning_rate,
                         target_update_tau=target_update_tau,
                         batch_size=batch_size, replay_ratio=replay_ratio,
                         **kwargs)

    def _init_opt_states(self, params):
        return {"mu": self.pi_optimizer.init(params["mu"]),
                "q": self.q_optimizer.init(params["q"])}

    def q_loss(self, q_params, params, batch):
        agent = self.agent
        q = agent.q_model.apply(q_params, batch.agent_inputs.observation,
                                batch.action)
        next_mu = agent.mu_model.apply(params["target_mu"],
                                       batch.target_inputs.observation)
        next_q = agent.q_model.apply(params["target_q"],
                                     batch.target_inputs.observation,
                                     next_mu)
        nonterminal, valid = self._bootstrap_mask(batch)
        disc = self.discount ** self.n_step
        y = jax.lax.stop_gradient(batch.return_ + disc * nonterminal * next_q)
        return valid_mean(0.5 * (y - q) ** 2, valid)

    def mu_loss(self, mu_params, params, batch):
        agent = self.agent
        mu = agent.mu_model.apply(mu_params, batch.agent_inputs.observation)
        q = agent.q_model.apply(params["q"],
                                batch.agent_inputs.observation, mu)
        _, valid = self._bootstrap_mask(batch)
        return -valid_mean(q, valid)

    def _one_update(self, train_state: QpgTrainState, replay_state, key):
        batch = self.replay.sample(replay_state, key, self.batch_size)
        params = train_state.params
        opt = train_state.opt_states

        q_loss, q_grads = jax.value_and_grad(self.q_loss)(
            params["q"], params, batch)
        q_up, q_opt = self.q_optimizer.update(q_grads, opt["q"],
                                              params["q"])
        params = {**params, "q": optax.apply_updates(params["q"], q_up)}

        mu_loss, mu_grads = jax.value_and_grad(self.mu_loss)(
            params["mu"], params, batch)
        mu_up, mu_opt = self.pi_optimizer.update(mu_grads, opt["mu"],
                                                 params["mu"])
        params = {**params, "mu": optax.apply_updates(params["mu"], mu_up)}

        tau = self.target_update_tau
        params = {**params,
                  "target_mu": polyak_update(params["target_mu"],
                                             params["mu"], tau),
                  "target_q": polyak_update(params["target_q"],
                                            params["q"], tau)}
        info = QpgOptInfo(
            q_loss=q_loss, pi_loss=mu_loss,
            q_grad_norm=global_norm(q_grads),
            pi_grad_norm=global_norm(mu_grads),
            alpha=jnp.zeros(()))
        return train_state._replace(
            params=params, opt_states={"mu": mu_opt, "q": q_opt},
            update_counter=train_state.update_counter + 1), info


class TD3(QpgBase):
    """(rlpyt/algos/qpg/td3.py:TD3 ~L10)."""

    def __init__(self, learning_rate=1e-3, q_learning_rate=1e-3,
                 target_update_tau=0.005, batch_size=100,
                 replay_ratio=100.0, policy_update_interval=2, **kwargs):
        super().__init__(learning_rate=learning_rate,
                         q_learning_rate=q_learning_rate,
                         target_update_tau=target_update_tau,
                         batch_size=batch_size, replay_ratio=replay_ratio,
                         **kwargs)
        self.policy_update_interval = policy_update_interval

    def _init_opt_states(self, params):
        return {"mu": self.pi_optimizer.init(params["mu"]),
                "q1": self.q_optimizer.init(params["q1"]),
                "q2": self.q_optimizer.init(params["q2"])}

    def q_loss(self, q_params: Tuple, params, batch, key):
        agent = self.agent
        q1 = agent.q_model.apply(q_params[0],
                                 batch.agent_inputs.observation,
                                 batch.action)
        q2 = agent.q_model.apply(q_params[1],
                                 batch.agent_inputs.observation,
                                 batch.action)
        next_mu = agent.mu_model.apply(params["target_mu"],
                                       batch.target_inputs.observation)
        # Target-policy smoothing: clipped noise on the target action.
        from rlpyt_tpu.distributions.gaussian import DistInfoStd
        noisy = agent.target_distribution.sample(
            key, DistInfoStd(mean=next_mu, log_std=jnp.zeros_like(next_mu)))
        nq1 = agent.q_model.apply(params["target_q1"],
                                  batch.target_inputs.observation, noisy)
        nq2 = agent.q_model.apply(params["target_q2"],
                                  batch.target_inputs.observation, noisy)
        next_q = jnp.minimum(nq1, nq2)
        nonterminal, valid = self._bootstrap_mask(batch)
        disc = self.discount ** self.n_step
        y = jax.lax.stop_gradient(batch.return_ + disc * nonterminal * next_q)
        return (valid_mean(0.5 * (y - q1) ** 2, valid)
                + valid_mean(0.5 * (y - q2) ** 2, valid))

    def mu_loss(self, mu_params, params, batch):
        agent = self.agent
        mu = agent.mu_model.apply(mu_params, batch.agent_inputs.observation)
        q1 = agent.q_model.apply(params["q1"],
                                 batch.agent_inputs.observation, mu)
        _, valid = self._bootstrap_mask(batch)
        return -valid_mean(q1, valid)

    def _one_update(self, train_state: QpgTrainState, replay_state, key):
        k_sample, k_noise = jax.random.split(key)
        batch = self.replay.sample(replay_state, k_sample, self.batch_size)
        params = train_state.params
        opt = train_state.opt_states

        q_loss, (g1, g2) = jax.value_and_grad(self.q_loss)(
            (params["q1"], params["q2"]), params, batch, k_noise)
        up1, q1_opt = self.q_optimizer.update(g1, opt["q1"], params["q1"])
        up2, q2_opt = self.q_optimizer.update(g2, opt["q2"], params["q2"])
        params = {**params,
                  "q1": optax.apply_updates(params["q1"], up1),
                  "q2": optax.apply_updates(params["q2"], up2)}

        counter = train_state.update_counter + 1
        do_pi = (counter % self.policy_update_interval) == 0

        mu_loss, mu_grads = jax.value_and_grad(self.mu_loss)(
            params["mu"], params, batch)
        mu_up, mu_opt_new = self.pi_optimizer.update(mu_grads, opt["mu"],
                                                     params["mu"])
        new_mu = optax.apply_updates(params["mu"], mu_up)
        tau = self.target_update_tau
        maybe = lambda new, old: jax.tree.map(
            lambda n, o: jnp.where(do_pi, n, o), new, old)
        params = {**params,
                  "mu": maybe(new_mu, params["mu"]),
                  "target_mu": maybe(
                      polyak_update(params["target_mu"], new_mu, tau),
                      params["target_mu"]),
                  "target_q1": polyak_update(params["target_q1"],
                                             params["q1"], tau),
                  "target_q2": polyak_update(params["target_q2"],
                                             params["q2"], tau)}
        mu_opt = maybe(mu_opt_new, opt["mu"])
        info = QpgOptInfo(
            q_loss=q_loss, pi_loss=mu_loss,
            q_grad_norm=global_norm((g1, g2)),
            pi_grad_norm=global_norm(mu_grads),
            alpha=jnp.zeros(()))
        return train_state._replace(
            params=params,
            opt_states={"mu": mu_opt, "q1": q1_opt, "q2": q2_opt},
            update_counter=counter), info


class SAC(QpgBase):
    """(rlpyt/algos/qpg/sac.py:SAC ~L20)."""

    def __init__(self, learning_rate=3e-4, target_update_tau=0.005,
                 batch_size=256, replay_ratio=256.0,
                 fixed_alpha: float | None = None,
                 target_entropy: str | float = "auto", **kwargs):
        super().__init__(learning_rate=learning_rate,
                         target_update_tau=target_update_tau,
                         batch_size=batch_size, replay_ratio=replay_ratio,
                         **kwargs)
        self.fixed_alpha = fixed_alpha
        self.target_entropy = target_entropy

    def initialize(self, agent, batch_spec, example_obs, key, n_itr=1):
        out = super().initialize(agent, batch_spec, example_obs, key, n_itr)
        if self.target_entropy == "auto":
            self._target_entropy = -float(agent.env_spaces.action.shape[0])
        else:
            self._target_entropy = float(self.target_entropy)
        return out

    def _init_opt_states(self, params):
        return {"pi": self.pi_optimizer.init(params["pi"]),
                "q1": self.q_optimizer.init(params["q1"]),
                "q2": self.q_optimizer.init(params["q2"])}

    def q_loss(self, q_params: Tuple, params, alpha, batch, key):
        agent = self.agent
        obs = batch.agent_inputs.observation
        q1 = agent.q_model.apply(q_params[0], obs, batch.action)
        q2 = agent.q_model.apply(q_params[1], obs, batch.action)
        next_obs = batch.target_inputs.observation
        next_a, next_logp = agent.pi(params, key, next_obs)
        nq1 = agent.q_model.apply(params["target_q1"], next_obs, next_a)
        nq2 = agent.q_model.apply(params["target_q2"], next_obs, next_a)
        next_q = jnp.minimum(nq1, nq2) - alpha * next_logp
        nonterminal, valid = self._bootstrap_mask(batch)
        disc = self.discount ** self.n_step
        y = jax.lax.stop_gradient(batch.return_ + disc * nonterminal * next_q)
        return (valid_mean(0.5 * (y - q1) ** 2, valid)
                + valid_mean(0.5 * (y - q2) ** 2, valid))

    def pi_loss(self, pi_params, params, alpha, batch, key):
        agent = self.agent
        obs = batch.agent_inputs.observation
        a, logp = agent.pi({**params, "pi": pi_params}, key, obs)
        q1 = agent.q_model.apply(params["q1"], obs, a)
        q2 = agent.q_model.apply(params["q2"], obs, a)
        q = jnp.minimum(q1, q2)
        _, valid = self._bootstrap_mask(batch)
        return valid_mean(alpha * logp - q, valid), logp

    def _one_update(self, train_state: QpgTrainState, replay_state, key):
        k_sample, k_next, k_pi = jax.random.split(key, 3)
        batch = self.replay.sample(replay_state, k_sample, self.batch_size)
        params = train_state.params
        opt = train_state.opt_states
        alpha = (jnp.exp(train_state.log_alpha)
                 if self.fixed_alpha is None else
                 jnp.float32(self.fixed_alpha))

        q_loss, (g1, g2) = jax.value_and_grad(self.q_loss)(
            (params["q1"], params["q2"]), params, alpha, batch, k_next)
        up1, q1_opt = self.q_optimizer.update(g1, opt["q1"], params["q1"])
        up2, q2_opt = self.q_optimizer.update(g2, opt["q2"], params["q2"])
        params = {**params,
                  "q1": optax.apply_updates(params["q1"], up1),
                  "q2": optax.apply_updates(params["q2"], up2)}

        (pi_loss, logp), pi_grads = jax.value_and_grad(
            self.pi_loss, has_aux=True)(
                params["pi"], params, alpha, batch, k_pi)
        pi_up, pi_opt = self.pi_optimizer.update(pi_grads, opt["pi"],
                                                 params["pi"])
        params = {**params,
                  "pi": optax.apply_updates(params["pi"], pi_up)}

        # Entropy coefficient update (rlpyt sac.py: learned log α).
        log_alpha = train_state.log_alpha
        alpha_opt_state = train_state.alpha_opt_state
        if self.fixed_alpha is None:
            def alpha_loss(la):
                return -jnp.mean(la * jax.lax.stop_gradient(
                    logp + self._target_entropy))

            a_grad = jax.grad(alpha_loss)(log_alpha)
            a_up, alpha_opt_state = self.alpha_optimizer.update(
                a_grad, alpha_opt_state, log_alpha)
            log_alpha = optax.apply_updates(log_alpha, a_up)

        tau = self.target_update_tau
        params = {**params,
                  "target_q1": polyak_update(params["target_q1"],
                                             params["q1"], tau),
                  "target_q2": polyak_update(params["target_q2"],
                                             params["q2"], tau)}
        info = QpgOptInfo(
            q_loss=q_loss, pi_loss=pi_loss,
            q_grad_norm=global_norm((g1, g2)),
            pi_grad_norm=global_norm(pi_grads),
            alpha=jnp.exp(log_alpha))
        return train_state._replace(
            params=params,
            opt_states={"pi": pi_opt, "q1": q1_opt, "q2": q2_opt},
            log_alpha=log_alpha, alpha_opt_state=alpha_opt_state,
            update_counter=train_state.update_counter + 1), info
