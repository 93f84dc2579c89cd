"""Q-value policy-gradient agents (reference:
rlpyt/agents/qpg/ddpg_agent.py:DdpgAgent, td3_agent.py:Td3Agent,
sac_agent.py:SacAgent).

Parameters are a dict pytree holding all networks and their targets; the
algorithm updates selected sub-trees and polyak-averages the targets —
replacing the reference's separate torch Modules + update_state_dict calls
with one functional pytree.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from rlpyt_tpu.agents.base import AgentStep, BaseAgent, StepCtx
from rlpyt_tpu.distributions.gaussian import DistInfoStd, Gaussian
from rlpyt_tpu.envs.base import EnvSpaces
from rlpyt_tpu.models.qpg import MuMlpModel, PiMlpModel, QofMuMlpModel


class DdpgAgent(BaseAgent):
    """μ + Q + targets; step = μ(s) + exploration noise
    (rlpyt/agents/qpg/ddpg_agent.py ~L15)."""

    def __init__(self, model_kwargs=None, q_model_kwargs=None,
                 initial_std=0.1, **kwargs):
        super().__init__(**kwargs)
        self.model_kwargs = dict(model_kwargs or {})
        self.q_model_kwargs = dict(q_model_kwargs or {})
        self.initial_std = initial_std

    def initialize(self, env_spaces: EnvSpaces):
        self.env_spaces = env_spaces
        action_size = env_spaces.action.shape[0]
        self.action_max = float(np.max(np.abs(env_spaces.action.high)))
        self.mu_model = MuMlpModel(action_size=action_size,
                                   output_max=self.action_max,
                                   **self.model_kwargs)
        self.q_model = QofMuMlpModel(**self.q_model_kwargs)
        self.distribution = Gaussian(dim=action_size, std=self.initial_std,
                                     clip=self.action_max)

    def init(self, key, example_obs) -> Dict:
        k1, k2 = jax.random.split(key)
        B = example_obs.shape[0]
        d = self.env_spaces.action.shape[0]
        act = jnp.zeros((B, d), jnp.float32)
        mu_params = self.mu_model.init(k1, example_obs)
        q_params = self.q_model.init(k2, example_obs, act)
        from rlpyt_tpu.struct import tree_copy
        return {"mu": mu_params, "q": q_params,
                "target_mu": tree_copy(mu_params),
                "target_q": tree_copy(q_params)}

    def step(self, params, key, observation, prev_action, prev_reward,
             carry, ctx: StepCtx):
        mu = self.mu_model.apply(params["mu"], observation)
        if ctx.is_eval:
            action = mu
        else:
            zeros = jnp.zeros_like(mu)
            action = self.distribution.sample(
                key, DistInfoStd(mean=mu, log_std=zeros))
        return AgentStep(action, {}), carry

    def example_agent_info(self, batch_B):
        return {}


class Td3Agent(DdpgAgent):
    """Twin critics + target-policy smoothing
    (rlpyt/agents/qpg/td3_agent.py ~L10)."""

    def __init__(self, target_noise_std=0.2, target_noise_clip=0.5, **kwargs):
        super().__init__(**kwargs)
        self.target_noise_std = target_noise_std
        self.target_noise_clip = target_noise_clip

    def initialize(self, env_spaces: EnvSpaces):
        super().initialize(env_spaces)
        self.target_distribution = Gaussian(
            dim=env_spaces.action.shape[0],
            std=self.target_noise_std,
            noise_clip=self.target_noise_clip,
            clip=self.action_max,
        )

    def init(self, key, example_obs) -> Dict:
        k1, k2, k3 = jax.random.split(key, 3)
        B = example_obs.shape[0]
        d = self.env_spaces.action.shape[0]
        act = jnp.zeros((B, d), jnp.float32)
        mu_params = self.mu_model.init(k1, example_obs)
        q1 = self.q_model.init(k2, example_obs, act)
        q2 = self.q_model.init(k3, example_obs, act)
        from rlpyt_tpu.struct import tree_copy
        return {"mu": mu_params, "q1": q1, "q2": q2,
                "target_mu": tree_copy(mu_params),
                "target_q1": tree_copy(q1), "target_q2": tree_copy(q2)}


class SacAgent(BaseAgent):
    """tanh-Gaussian π + twin Q + twin targets
    (rlpyt/agents/qpg/sac_agent.py ~L20)."""

    def __init__(self, model_kwargs=None, q_model_kwargs=None, **kwargs):
        super().__init__(**kwargs)
        self.model_kwargs = dict(model_kwargs or {})
        self.q_model_kwargs = dict(q_model_kwargs or {})

    def initialize(self, env_spaces: EnvSpaces):
        self.env_spaces = env_spaces
        action_size = env_spaces.action.shape[0]
        self.action_max = float(np.max(np.abs(env_spaces.action.high)))
        self.pi_model = PiMlpModel(action_size=action_size,
                                   **self.model_kwargs)
        self.q_model = QofMuMlpModel(**self.q_model_kwargs)
        # min/max std clamps per the reference (MIN_LOG_STD=-20, MAX=2).
        self.distribution = Gaussian(
            dim=action_size,
            squash=self.action_max,
            min_std=float(np.exp(-20.0)),
            max_std=float(np.exp(2.0)),
        )

    def init(self, key, example_obs) -> Dict:
        k1, k2, k3 = jax.random.split(key, 3)
        B = example_obs.shape[0]
        d = self.env_spaces.action.shape[0]
        act = jnp.zeros((B, d), jnp.float32)
        pi = self.pi_model.init(k1, example_obs)
        q1 = self.q_model.init(k2, example_obs, act)
        q2 = self.q_model.init(k3, example_obs, act)
        from rlpyt_tpu.struct import tree_copy
        return {"pi": pi, "q1": q1, "q2": q2,
                "target_q1": tree_copy(q1), "target_q2": tree_copy(q2)}

    def pi(self, params, key, observation):
        """Reparameterized sample + log π (used by the SAC losses)."""
        mu, log_std = self.pi_model.apply(params["pi"], observation)
        return self.distribution.sample_with_log_prob(
            key, DistInfoStd(mean=mu, log_std=log_std))

    def step(self, params, key, observation, prev_action, prev_reward,
             carry, ctx: StepCtx):
        mu, log_std = self.pi_model.apply(params["pi"], observation)
        if ctx.is_eval:
            action = self.action_max * jnp.tanh(mu)
        else:
            action = self.distribution.sample(
                key, DistInfoStd(mean=mu, log_std=log_std))
        return AgentStep(action, {}), carry

    def example_agent_info(self, batch_B):
        return {}
