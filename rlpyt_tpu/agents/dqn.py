"""DQN-family agents (reference: rlpyt/agents/dqn/dqn_agent.py:DqnAgent,
epsilon_greedy.py:EpsilonGreedyAgentMixin, catdqn_agent.py, r2d1_agent.py).

The ε schedule is a pure function of the traced global step count, so it
lives inside jit (rlpyt mutated agent state per-itr from the host).  The
per-env vector-ε option reproduces R2D1-style distributed exploration:
env b of B gets ε_b = ε^(1 + α·b/(B−1)).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rlpyt_tpu.agents.base import AgentStep, BaseAgent, StepCtx
from rlpyt_tpu.distributions.epsilon_greedy import (
    CategoricalEpsilonGreedy,
    EpsilonGreedy,
)
from rlpyt_tpu.envs.base import EnvSpaces
from rlpyt_tpu.models.dqn import AtariCatDqnModel, AtariDqnModel, AtariR2d1Model
from rlpyt_tpu.models.rnn import zero_rnn_state


class EpsilonGreedyMixin:
    """(rlpyt/agents/dqn/epsilon_greedy.py:EpsilonGreedyAgentMixin ~L10)."""

    def _init_epsilon(self, eps_init=1.0, eps_final=0.01, eps_steps=int(50e3),
                      eval_eps=0.001, eps_final_min=None, alpha=7.0):
        self.eps_init = eps_init
        self.eps_final = eps_final
        self.eps_steps = eps_steps
        self.eval_eps = eval_eps
        # Vector-ε: per-env final epsilons log-spaced down to eps_final_min.
        self.eps_final_min = eps_final_min
        self.eps_alpha = alpha

    def epsilon(self, ctx: StepCtx, batch_B: int) -> jax.Array:
        if ctx.is_eval:
            return jnp.float32(self.eval_eps)
        frac = jnp.clip(ctx.cum_steps.astype(jnp.float32) / self.eps_steps,
                        0.0, 1.0)
        if self.eps_final_min is None:
            return self.eps_init + frac * (self.eps_final - self.eps_init)
        # Per-env ε (R2D1): interpolate toward log-spaced per-env finals.
        b = np.arange(batch_B) / max(batch_B - 1, 1)
        finals = np.exp(
            np.log(self.eps_final)
            + b * (np.log(self.eps_final_min) - np.log(self.eps_final)))
        finals = jnp.asarray(finals, jnp.float32)
        return self.eps_init + frac * (finals - self.eps_init)


class DqnAgent(EpsilonGreedyMixin, BaseAgent):
    """(rlpyt/agents/dqn/dqn_agent.py:DqnAgent ~L15)."""

    def __init__(self, ModelCls=AtariDqnModel, model_kwargs=None,
                 eps_init=1.0, eps_final=0.01, eps_steps=int(50e3),
                 eval_eps=0.001, eps_final_min=None, **kwargs):
        super().__init__(ModelCls=ModelCls, model_kwargs=model_kwargs,
                         **kwargs)
        self._init_epsilon(eps_init, eps_final, eps_steps, eval_eps,
                           eps_final_min)
        self.distribution = None

    def make_env_to_model_kwargs(self, env_spaces: EnvSpaces) -> dict:
        return {"n_actions": env_spaces.action.n}

    def initialize(self, env_spaces: EnvSpaces):
        super().initialize(env_spaces)
        self.distribution = EpsilonGreedy(env_spaces.action.n)

    def init(self, key, example_obs):
        return self.model.init(key, example_obs)

    def q(self, params, observation, prev_action=None, prev_reward=None):
        return self.model.apply(params, observation, prev_action, prev_reward)

    def step(self, params, key, observation, prev_action, prev_reward,
             carry, ctx: StepCtx):
        q = self.q(params, observation, prev_action, prev_reward)
        eps = self.epsilon(ctx, q.shape[0])
        action = self.distribution.sample(key, q, eps)
        return AgentStep(action, {"q": q}), carry

    def example_agent_info(self, batch_B):
        n = self.env_spaces.action.n
        return {"q": jnp.zeros((n,), jnp.float32)}


class CatDqnAgent(DqnAgent):
    """(rlpyt/agents/dqn/catdqn_agent.py:CatDqnAgent ~L10)."""

    def __init__(self, ModelCls=AtariCatDqnModel, n_atoms=51,
                 v_min=-10.0, v_max=10.0, **kwargs):
        super().__init__(ModelCls=ModelCls, **kwargs)
        self.n_atoms = n_atoms
        self.v_min = v_min
        self.v_max = v_max
        self.model_kwargs.setdefault("n_atoms", n_atoms)

    @property
    def z(self):
        return jnp.linspace(self.v_min, self.v_max, self.n_atoms)

    def initialize(self, env_spaces: EnvSpaces):
        BaseAgent.initialize(self, env_spaces)
        self.distribution = CategoricalEpsilonGreedy(env_spaces.action.n,
                                                     self.z)

    def step(self, params, key, observation, prev_action, prev_reward,
             carry, ctx: StepCtx):
        p = self.model.apply(params, observation, prev_action, prev_reward)
        eps = self.epsilon(ctx, p.shape[0])
        action = self.distribution.sample(key, p, eps)
        return AgentStep(action, {"p": p}), carry

    def example_agent_info(self, batch_B):
        n = self.env_spaces.action.n
        return {"p": jnp.zeros((n, self.n_atoms), jnp.float32)}


class R2d1Agent(DqnAgent):
    """Recurrent Q agent (rlpyt/agents/dqn/r2d1_agent.py:R2d1Agent ~L10).

    Stores ``prev_rnn_state`` into agent_info each step so sequence replay
    can reconstruct training-time initial states.
    """

    recurrent = True

    def __init__(self, ModelCls=AtariR2d1Model, lstm_size=512,
                 eps_final_min=0.0005, **kwargs):
        super().__init__(ModelCls=ModelCls, eps_final_min=eps_final_min,
                         **kwargs)
        # model_kwargs wins if it names a size (one source of truth for
        # the carried state shape).
        self.lstm_size = self.model_kwargs.get("lstm_size", lstm_size)
        self.model_kwargs.setdefault("lstm_size", self.lstm_size)

    def init(self, key, example_obs):
        B = example_obs.shape[0]
        carry = self.init_carry(B)
        return self.model.init(
            key, example_obs, jnp.zeros((B,), jnp.int32),
            jnp.zeros((B,), jnp.float32), carry)

    def init_carry(self, batch_B: int):
        return zero_rnn_state((batch_B,), self.lstm_size)

    def step(self, params, key, observation, prev_action, prev_reward,
             carry, ctx: StepCtx):
        q, next_carry = self.model.apply(
            params, observation, prev_action, prev_reward, carry)
        eps = self.epsilon(ctx, q.shape[0])
        action = self.distribution.sample(key, q, eps)
        info = {"q": q, "prev_rnn_state": carry}
        return AgentStep(action, info), next_carry

    def example_agent_info(self, batch_B):
        n = self.env_spaces.action.n
        h = jnp.zeros((self.lstm_size,), jnp.float32)
        return {"q": jnp.zeros((n,), jnp.float32), "prev_rnn_state": (h, h)}
