"""Policy-gradient agents (reference: rlpyt/agents/pg/categorical.py:
CategoricalPgAgent, gaussian.py:GaussianPgAgent, + recurrent variants,
base.py:AgentInfo/AgentInfoRnn).

agent_info carries ``dist_info`` and ``value`` through the sample buffer so
PPO can compute likelihood ratios against collection-time probabilities —
identical role to rlpyt's AgentInfo namedarraytuple.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rlpyt_tpu.agents.base import AgentStep, BaseAgent, StepCtx
from rlpyt_tpu.distributions.categorical import Categorical, DistInfo
from rlpyt_tpu.distributions.gaussian import DistInfoStd, Gaussian
from rlpyt_tpu.envs.base import EnvSpaces
from rlpyt_tpu.models.pg import (
    AtariFfModel,
    AtariLstmModel,
    MujocoFfModel,
    MujocoLstmModel,
)
from rlpyt_tpu.models.rnn import zero_rnn_state


class CategoricalPgAgent(BaseAgent):
    """(rlpyt/agents/pg/categorical.py:CategoricalPgAgent ~L10)."""

    def __init__(self, ModelCls=AtariFfModel, model_kwargs=None, **kwargs):
        super().__init__(ModelCls=ModelCls, model_kwargs=model_kwargs,
                         **kwargs)
        self.distribution = None

    def make_env_to_model_kwargs(self, env_spaces: EnvSpaces) -> dict:
        return {"n_actions": env_spaces.action.n}

    def initialize(self, env_spaces: EnvSpaces):
        super().initialize(env_spaces)
        self.distribution = Categorical(env_spaces.action.n)

    def init(self, key, example_obs):
        return self.model.init(key, example_obs)

    def __call__(self, params, observation, prev_action=None,
                 prev_reward=None):
        """Train-time forward: (DistInfo, value) over [T, B]."""
        pi_logits, v = self.model.apply(params, observation, prev_action,
                                        prev_reward)
        return DistInfo(prob=jax.nn.softmax(pi_logits, axis=-1)), v

    def step(self, params, key, observation, prev_action, prev_reward,
             carry, ctx: StepCtx):
        pi_logits, v = self.model.apply(params, observation, prev_action,
                                        prev_reward)
        prob = jax.nn.softmax(pi_logits, axis=-1)
        dist_info = DistInfo(prob=prob)
        if ctx.is_eval:
            action = jnp.argmax(pi_logits, axis=-1).astype(jnp.int32)
        else:
            action = self.distribution.sample(key, dist_info)
        info = {"dist_info": dist_info, "value": v}
        return AgentStep(action, info), carry

    def value(self, params, observation, prev_action=None, prev_reward=None):
        """Bootstrap value V(s_T) (rlpyt agent.value)."""
        _, v = self.model.apply(params, observation, prev_action, prev_reward)
        return v

    def example_agent_info(self, batch_B):
        n = self.env_spaces.action.n
        return {"dist_info": DistInfo(prob=jnp.zeros((n,), jnp.float32)),
                "value": jnp.zeros((), jnp.float32)}


class GaussianPgAgent(BaseAgent):
    """(rlpyt/agents/pg/gaussian.py:GaussianPgAgent ~L10)."""

    def __init__(self, ModelCls=MujocoFfModel, model_kwargs=None, **kwargs):
        super().__init__(ModelCls=ModelCls, model_kwargs=model_kwargs,
                         **kwargs)
        self.distribution = None

    def make_env_to_model_kwargs(self, env_spaces: EnvSpaces) -> dict:
        return {"action_size": env_spaces.action.shape[0]}

    def initialize(self, env_spaces: EnvSpaces):
        super().initialize(env_spaces)
        self.distribution = Gaussian(
            dim=env_spaces.action.shape[0],
            min_std=1e-6,
        )

    def init(self, key, example_obs):
        return self.model.init(key, example_obs)

    def __call__(self, params, observation, prev_action=None,
                 prev_reward=None):
        mu, log_std, v = self.model.apply(params, observation, prev_action,
                                          prev_reward)
        return DistInfoStd(mean=mu, log_std=log_std), v

    def step(self, params, key, observation, prev_action, prev_reward,
             carry, ctx: StepCtx):
        mu, log_std, v = self.model.apply(params, observation, prev_action,
                                          prev_reward)
        dist_info = DistInfoStd(mean=mu, log_std=log_std)
        if ctx.is_eval:
            action = mu
        else:
            action = self.distribution.sample(key, dist_info)
        info = {"dist_info": dist_info, "value": v}
        return AgentStep(action, info), carry

    def value(self, params, observation, prev_action=None, prev_reward=None):
        _, _, v = self.model.apply(params, observation, prev_action,
                                   prev_reward)
        return v

    def example_agent_info(self, batch_B):
        d = self.env_spaces.action.shape[0]
        return {
            "dist_info": DistInfoStd(mean=jnp.zeros((d,), jnp.float32),
                                     log_std=jnp.zeros((d,), jnp.float32)),
            "value": jnp.zeros((), jnp.float32),
        }


class RecurrentCategoricalPgAgent(CategoricalPgAgent):
    """(rlpyt/agents/pg/categorical.py:RecurrentCategoricalPgAgent)."""

    recurrent = True

    def __init__(self, ModelCls=AtariLstmModel, lstm_size=512, **kwargs):
        super().__init__(ModelCls=ModelCls, **kwargs)
        self.lstm_size = self.model_kwargs.get("lstm_size", lstm_size)
        self.model_kwargs.setdefault("lstm_size", self.lstm_size)

    def init(self, key, example_obs):
        B = example_obs.shape[0]
        carry = self.init_carry(B)
        return self.model.init(
            key, example_obs, jnp.zeros((B,), jnp.int32),
            jnp.zeros((B,), jnp.float32), carry)

    def init_carry(self, batch_B):
        return zero_rnn_state((batch_B,), self.lstm_size)

    def __call__(self, params, observation, prev_action, prev_reward,
                 init_rnn_state, done=None):
        pi_logits, v, next_state = self.model.apply(
            params, observation, prev_action, prev_reward, init_rnn_state,
            done)
        return (DistInfo(prob=jax.nn.softmax(pi_logits, axis=-1)), v,
                next_state)

    def step(self, params, key, observation, prev_action, prev_reward,
             carry, ctx: StepCtx):
        pi_logits, v, next_carry = self.model.apply(
            params, observation, prev_action, prev_reward, carry)
        prob = jax.nn.softmax(pi_logits, axis=-1)
        dist_info = DistInfo(prob=prob)
        if ctx.is_eval:
            action = jnp.argmax(pi_logits, axis=-1).astype(jnp.int32)
        else:
            action = self.distribution.sample(key, dist_info)
        info = {"dist_info": dist_info, "value": v, "prev_rnn_state": carry}
        return AgentStep(action, info), next_carry

    def value(self, params, observation, prev_action, prev_reward,
              carry=None):
        _, v, _ = self.model.apply(params, observation, prev_action,
                                   prev_reward, carry)
        return v

    def example_agent_info(self, batch_B):
        base = super().example_agent_info(batch_B)
        h = jnp.zeros((self.lstm_size,), jnp.float32)
        base["prev_rnn_state"] = (h, h)
        return base


class RecurrentGaussianPgAgent(GaussianPgAgent):
    """(rlpyt/agents/pg/gaussian.py:RecurrentGaussianPgAgent)."""

    recurrent = True

    def __init__(self, ModelCls=MujocoLstmModel, lstm_size=256, **kwargs):
        super().__init__(ModelCls=ModelCls, **kwargs)
        self.lstm_size = self.model_kwargs.get("lstm_size", lstm_size)
        self.model_kwargs.setdefault("lstm_size", self.lstm_size)

    def init(self, key, example_obs):
        B = example_obs.shape[0]
        d = self.env_spaces.action.shape[0]
        carry = self.init_carry(B)
        return self.model.init(
            key, example_obs, jnp.zeros((B, d), jnp.float32),
            jnp.zeros((B,), jnp.float32), carry)

    def init_carry(self, batch_B):
        return zero_rnn_state((batch_B,), self.lstm_size)

    def __call__(self, params, observation, prev_action, prev_reward,
                 init_rnn_state, done=None):
        mu, log_std, v, next_state = self.model.apply(
            params, observation, prev_action, prev_reward, init_rnn_state,
            done)
        return DistInfoStd(mean=mu, log_std=log_std), v, next_state

    def step(self, params, key, observation, prev_action, prev_reward,
             carry, ctx: StepCtx):
        mu, log_std, v, next_carry = self.model.apply(
            params, observation, prev_action, prev_reward, carry)
        dist_info = DistInfoStd(mean=mu, log_std=log_std)
        action = mu if ctx.is_eval else self.distribution.sample(key,
                                                                 dist_info)
        info = {"dist_info": dist_info, "value": v, "prev_rnn_state": carry}
        return AgentStep(action, info), next_carry

    def value(self, params, observation, prev_action, prev_reward,
              carry=None):
        _, _, v, _ = self.model.apply(params, observation, prev_action,
                                      prev_reward, carry)
        return v

    def example_agent_info(self, batch_B):
        base = super().example_agent_info(batch_B)
        h = jnp.zeros((self.lstm_size,), jnp.float32)
        base["prev_rnn_state"] = (h, h)
        return base
