"""Agent interface (reference: rlpyt/agents/base.py:BaseAgent, AgentStep,
RecurrentAgentMixin ~L20-350).

rlpyt's agent is a stateful object bridging numpy sampler-land and torch
algo-land, with shared-memory weight sync for worker processes.  Here the
agent is a thin *configuration* object (model defs + distribution) exposing
pure functions; parameters and per-env recurrent state are explicit pytrees
threaded by the rollout engine — no device copies, no weight sync, because
sampling and learning share one program.

Contract:
  init(key, env_spaces, example_obs)  -> params (pytree)
  init_carry(batch_B)                 -> per-env agent carry (rnn state …)
  step(params, key, obs, prev_action, prev_reward, carry, step_ctx)
      -> (AgentStep(action, agent_info), new_carry)
where ``step_ctx`` carries schedule inputs (global env-step count for ε
decay, eval flag) as traced scalars so the whole schedule lives inside jit.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from rlpyt_tpu.envs.base import EnvSpaces


class AgentStep(NamedTuple):
    """(rlpyt/agents/base.py:AgentStep)."""

    action: jax.Array
    agent_info: Dict[str, Any]


class StepCtx(NamedTuple):
    """Traced schedule context for agent.step — replaces rlpyt's
    ``agent.sample_mode(itr)`` / ``set_epsilon_itr`` host-side mutation."""

    cum_steps: jax.Array  # global env steps so far (for ε/σ schedules)
    is_eval: bool = False  # static: eval-mode collection


class BaseAgent:
    recurrent: bool = False

    def __init__(self, ModelCls=None, model_kwargs=None,
                 initial_params=None):
        self.ModelCls = ModelCls
        self.model_kwargs = dict(model_kwargs or {})
        self.initial_params = initial_params
        self.model = None
        self.env_spaces: EnvSpaces | None = None

    # ------------------------------------------------------------------
    # Construction (rlpyt BaseAgent.initialize(env_spaces, ...)).
    # ------------------------------------------------------------------

    def make_env_to_model_kwargs(self, env_spaces: EnvSpaces) -> dict:
        return {}

    def initialize(self, env_spaces: EnvSpaces):
        """Bind env spaces and build the model definition (not params)."""
        self.env_spaces = env_spaces
        kwargs = {**self.make_env_to_model_kwargs(env_spaces),
                  **self.model_kwargs}
        self.model = self.ModelCls(**kwargs)

    def init(self, key: jax.Array, example_obs) -> Any:
        """Initialize parameter pytree from one example observation [B,...]."""
        raise NotImplementedError

    # ------------------------------------------------------------------
    # Sampling-time step (pure).
    # ------------------------------------------------------------------

    def init_carry(self, batch_B: int):
        """Per-env recurrent carry; None for feedforward agents."""
        return None

    def reset_carry_where(self, done: jax.Array, carry):
        """Zero carry entries for done envs (RecurrentAgentMixin.reset_one)."""
        if carry is None:
            return None
        mask = (~done).astype(jnp.float32)

        def _mask(c):
            m = mask.reshape(mask.shape + (1,) * (c.ndim - mask.ndim))
            return c * m

        return jax.tree.map(_mask, carry)

    def step(self, params, key, observation, prev_action, prev_reward,
             carry, ctx: StepCtx):
        raise NotImplementedError

    def example_agent_info(self, batch_B: int) -> Dict[str, Any]:
        """Static agent_info schema for buffer preallocation."""
        return {}
