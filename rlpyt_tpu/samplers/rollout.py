"""The rollout engine — TPU-native replacement for rlpyt's entire samplers
layer (reference: rlpyt/samplers/serial/sampler.py, parallel/base.py,
parallel/gpu/action_server.py, collectors.py …).

rlpyt spends ~3,000 LoC on worker processes, shared-memory arenas, barriers
and semaphores to step C++ envs in parallel and batch model inference.  With
pure-functional envs the whole machinery collapses to ONE ``lax.scan`` over
time of a vmapped (env.step ∘ agent.step) composition, jitted together with
the learner — zero host round-trips, zero synchronization.  B envs step in
lockstep; XLA batches inference across them exactly like the reference's GPU
"action server" but without leaving the device.

Auto-reset follows rlpyt's CpuResetCollector semantics (reset immediately
mid-batch, ``mid_batch_reset=True``): when env b reports done at step t, the
observation recorded at t+1 is the reset observation and prev_action/
prev_reward are zeroed; recurrent agent state is reset per-env
(rlpyt/agents/base.py:RecurrentAgentMixin.reset_one).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from rlpyt_tpu.agents.base import BaseAgent, StepCtx
from rlpyt_tpu.envs.base import Env
from rlpyt_tpu.struct import tree_select


class BatchSpec(NamedTuple):
    """(rlpyt/samplers/collections.py:BatchSpec)."""

    T: int
    B: int

    @property
    def size(self) -> int:
        return self.T * self.B


class Samples(NamedTuple):
    """The canonical [T, B, ...] sample batch
    (rlpyt/samplers/collections.py:Samples/AgentSamples/EnvSamples)."""

    observation: Any
    action: Any
    reward: jax.Array
    done: jax.Array
    prev_action: Any
    prev_reward: jax.Array
    agent_info: Dict[str, Any]
    env_info: Dict[str, Any]


class TrajStats(NamedTuple):
    """Completed-trajectory accumulators (rlpyt/samplers/collections.py:
    TrajInfo) — scalar sums so stats stream out of jit cheaply."""

    completed: jax.Array     # int32 count of episodes finished in window
    sum_return: jax.Array
    sum_sq_return: jax.Array  # for ReturnStd (rlpyt record_tabular_misc_stat)
    sum_length: jax.Array
    sum_nonzero_rewards: jax.Array
    sum_discounted_return: jax.Array  # rlpyt TrajInfo.DiscountedReturn
    max_return: jax.Array
    min_return: jax.Array

    @staticmethod
    def zeros() -> "TrajStats":
        return TrajStats(
            completed=jnp.zeros((), jnp.int32),
            sum_return=jnp.zeros((), jnp.float32),
            sum_sq_return=jnp.zeros((), jnp.float32),
            sum_length=jnp.zeros((), jnp.float32),
            sum_nonzero_rewards=jnp.zeros((), jnp.float32),
            sum_discounted_return=jnp.zeros((), jnp.float32),
            max_return=jnp.full((), -jnp.inf, jnp.float32),
            min_return=jnp.full((), jnp.inf, jnp.float32),
        )


class RolloutState(NamedTuple):
    """Everything the collector carries across iterations — the functional
    analogue of rlpyt's collector + agent + env mutable state."""

    key: jax.Array
    env_state: Any           # vmapped env state [B]
    observation: Any         # [B, ...]
    prev_action: Any         # [B, ...]
    prev_reward: jax.Array   # [B]
    agent_carry: Any         # recurrent state or None
    cum_steps: jax.Array     # int64-ish step count (int32 ok to 2B steps)
    ep_return: jax.Array     # [B] running returns
    ep_length: jax.Array     # [B]
    ep_nonzero: jax.Array    # [B] count of nonzero rewards this episode
    ep_discounted: jax.Array  # [B] running discounted return
    ep_gamma: jax.Array      # [B] discount^t within episode
    needs_reset: jax.Array   # [B] done-and-waiting (WaitResetCollector)
    traj_stats: TrajStats


class Collector:
    """Builds and steps the vmapped env/agent composition.

    One Collector instance ≈ rlpyt (Sampler + Collector + ActionServer).
    All methods are pure; jit them (or embed in a larger jitted program).
    """

    def __init__(self, env: Env, agent: BaseAgent, batch_spec: BatchSpec,
                 env_params=None, mid_batch_reset: bool = True,
                 discount: float = 1.0):
        self.env = env
        self.agent = agent
        self.batch_spec = batch_spec
        self.env_params = env_params
        self.mid_batch_reset = mid_batch_reset
        # TrajInfo discount for the DiscountedReturn stat (rlpyt's
        # traj_info_kwargs discount, default 1 like TrajInfo._discount).
        self.discount = float(discount)

    # ------------------------------------------------------------------

    def init_state(self, key: jax.Array) -> RolloutState:
        k_env, key = jax.random.split(key)
        B = self.batch_spec.B
        env_state, obs = self.env.reset_batch(k_env, B, self.env_params)
        act_null = self.env.spaces.action.null_value()
        prev_action = jnp.broadcast_to(
            act_null, (B,) + act_null.shape).astype(act_null.dtype)
        return RolloutState(
            key=key,
            env_state=env_state,
            observation=obs,
            prev_action=prev_action,
            prev_reward=jnp.zeros((B,), jnp.float32),
            agent_carry=self.agent.init_carry(B),
            cum_steps=jnp.zeros((), jnp.int32),
            ep_return=jnp.zeros((B,), jnp.float32),
            ep_length=jnp.zeros((B,), jnp.float32),
            ep_nonzero=jnp.zeros((B,), jnp.float32),
            ep_discounted=jnp.zeros((B,), jnp.float32),
            ep_gamma=jnp.ones((B,), jnp.float32),
            needs_reset=jnp.zeros((B,), jnp.bool_),
            traj_stats=TrajStats.zeros(),
        )

    def decorrelate(self, state: RolloutState, max_steps: int
                    ) -> RolloutState:
        """Random-action start-state decorrelation
        (rlpyt/samplers/collectors.py:DecorrelatingStartCollector): each env
        takes a random number of uniform-random steps in [0, max_steps)."""
        if max_steps <= 0:
            return state
        B = self.batch_spec.B
        key, k_n = jax.random.split(state.key)
        n_steps = jax.random.randint(k_n, (B,), 0, max_steps)

        def body(i, carry):
            key, env_state, obs, prev_a, prev_r = carry
            key, k_act, k_env, k_reset = jax.random.split(key, 4)
            action = jax.vmap(self.env.spaces.action.sample)(
                jax.random.split(k_act, B))
            new_env_state, env_step = self.env.step_batch(
                k_env, env_state, action, self.env_params)
            reset_state, reset_obs = self.env.reset_batch(
                k_reset, B, self.env_params)
            done = env_step.done
            new_env_state = tree_select(done, reset_state, new_env_state)
            new_obs = tree_select(done, reset_obs, env_step.observation)
            active = i < n_steps  # [B] — stop stepping finished envs
            env_state = tree_select(active, new_env_state, env_state)
            obs = tree_select(active, new_obs, obs)
            zero_a = jnp.zeros_like(action)
            na = tree_select(done, zero_a, action)
            prev_a = tree_select(active, na, prev_a)
            nr = jnp.where(done, 0.0, env_step.reward)
            prev_r = jnp.where(active, nr, prev_r)
            return (key, env_state, obs, prev_a, prev_r)

        key, env_state, obs, prev_a, prev_r = jax.lax.fori_loop(
            0, max_steps, body,
            (key, state.env_state, state.observation, state.prev_action,
             state.prev_reward))
        return state._replace(key=key, env_state=env_state, observation=obs,
                              prev_action=prev_a, prev_reward=prev_r)

    # ------------------------------------------------------------------

    def collect(self, params, state: RolloutState,
                is_eval: bool = False,
                max_trajectories: Optional[int] = None
                ) -> Tuple[RolloutState, Samples]:
        """Collect one [T, B] batch (rlpyt sampler.obtain_samples).

        ``mid_batch_reset=False`` reproduces rlpyt's WaitResetCollector:
        a done env freezes (recorded done=True each step, so
        ``valid_from_done`` masks it) and resets only at batch end.
        ``max_trajectories`` caps completed-trajectory accounting
        (rlpyt eval_max_trajectories)."""
        T, B = self.batch_spec

        def step_fn(carry: RolloutState, _):
            return self._step(params, carry, is_eval, max_trajectories)

        state, samples = jax.lax.scan(step_fn, state, None, length=T)
        if not self.mid_batch_reset:
            state = self._reset_waiting(state)
        return state, samples

    def _step(self, params, carry: RolloutState, is_eval: bool,
              max_trajectories: Optional[int]
              ) -> Tuple[RolloutState, Samples]:
        """One timestep of the (agent.step ∘ env.step) composition —
        the body shared by collect()'s scan and evaluate()'s
        while_loop."""
        B = self.batch_spec.B
        key, k_agent, k_env, k_reset = jax.random.split(carry.key, 4)
        ctx = StepCtx(cum_steps=carry.cum_steps, is_eval=is_eval)
        agent_step, agent_carry = self.agent.step(
            params, k_agent, carry.observation, carry.prev_action,
            carry.prev_reward, carry.agent_carry, ctx)
        action = agent_step.action
        env_state, env_step = self.env.step_batch(
            k_env, carry.env_state, action, self.env_params)
        reward = env_step.reward.astype(jnp.float32)
        done = env_step.done
        waiting = carry.needs_reset
        if not self.mid_batch_reset:
            # Frozen envs: no state advance, zero reward, done stays.
            env_state = tree_select(waiting, carry.env_state, env_state)
            reward = jnp.where(waiting, 0.0, reward)
            done = done | waiting
        fresh_done = done & ~waiting  # episodes finishing this step

        out = Samples(
            observation=carry.observation,
            action=action,
            reward=reward,
            done=done,
            prev_action=carry.prev_action,
            prev_reward=carry.prev_reward,
            agent_info=agent_step.agent_info,
            env_info=env_step.info,
        )

        # --- trajectory accounting -------------------------------
        live = (~waiting).astype(jnp.float32)
        ep_return = carry.ep_return + reward * live
        ep_length = carry.ep_length + live
        ep_nonzero = carry.ep_nonzero + (reward != 0.0) * live
        ep_discounted = (carry.ep_discounted
                         + reward * carry.ep_gamma * live)
        ep_gamma = jnp.where(waiting, carry.ep_gamma,
                             carry.ep_gamma * self.discount)
        d = fresh_done
        ts = carry.traj_stats
        if max_trajectories is not None:
            d = d & (ts.completed < max_trajectories)
        df = d.astype(jnp.float32)
        traj_stats = TrajStats(
            completed=ts.completed + jnp.sum(d.astype(jnp.int32)),
            sum_return=ts.sum_return + jnp.sum(ep_return * df),
            sum_sq_return=(ts.sum_sq_return
                           + jnp.sum(ep_return ** 2 * df)),
            sum_length=ts.sum_length + jnp.sum(ep_length * df),
            sum_nonzero_rewards=(
                ts.sum_nonzero_rewards + jnp.sum(ep_nonzero * df)),
            sum_discounted_return=(
                ts.sum_discounted_return
                + jnp.sum(ep_discounted * df)),
            max_return=jnp.maximum(
                ts.max_return,
                jnp.max(jnp.where(d, ep_return, -jnp.inf))),
            min_return=jnp.minimum(
                ts.min_return,
                jnp.min(jnp.where(d, ep_return, jnp.inf))),
        )
        finished = fresh_done.astype(jnp.float32)
        ep_return = ep_return * (1.0 - finished)
        ep_length = ep_length * (1.0 - finished)
        ep_nonzero = ep_nonzero * (1.0 - finished)
        ep_discounted = ep_discounted * (1.0 - finished)
        ep_gamma = jnp.where(fresh_done, 1.0, ep_gamma)

        if self.mid_batch_reset:
            # --- auto-reset (CpuResetCollector parity) -----------
            reset_state, reset_obs = self.env.reset_batch(
                k_reset, B, self.env_params)
            env_state = tree_select(done, reset_state, env_state)
            observation = tree_select(done, reset_obs,
                                      env_step.observation)
            prev_action = tree_select(done, jnp.zeros_like(action),
                                      action)
            prev_reward = jnp.where(done, 0.0, reward)
            agent_carry = self.agent.reset_carry_where(done, agent_carry)
            needs_reset = carry.needs_reset
        else:
            # --- wait-reset: freeze until batch end --------------
            observation = tree_select(done, carry.observation,
                                      env_step.observation)
            prev_action = tree_select(done, jnp.zeros_like(action),
                                      action)
            prev_reward = jnp.where(done, 0.0, reward)
            needs_reset = done

        new_carry = RolloutState(
            key=key,
            env_state=env_state,
            observation=observation,
            prev_action=prev_action,
            prev_reward=prev_reward,
            agent_carry=agent_carry,
            cum_steps=carry.cum_steps + B,
            ep_return=ep_return,
            ep_length=ep_length,
            ep_nonzero=ep_nonzero,
            ep_discounted=ep_discounted,
            ep_gamma=ep_gamma,
            needs_reset=needs_reset,
            traj_stats=traj_stats,
        )
        return new_carry, out


    def _reset_waiting(self, state: RolloutState) -> RolloutState:
        """Batch-end reset of done-and-waiting envs
        (rlpyt WaitResetCollector.reset_if_needed)."""
        key, k_reset = jax.random.split(state.key)
        B = self.batch_spec.B
        reset_state, reset_obs = self.env.reset_batch(
            k_reset, B, self.env_params)
        w = state.needs_reset
        act_null = jnp.zeros_like(state.prev_action)
        return state._replace(
            key=key,
            env_state=tree_select(w, reset_state, state.env_state),
            observation=tree_select(w, reset_obs, state.observation),
            prev_action=tree_select(w, act_null, state.prev_action),
            prev_reward=jnp.where(w, 0.0, state.prev_reward),
            agent_carry=self.agent.reset_carry_where(w, state.agent_carry),
            needs_reset=jnp.zeros_like(w),
        )

    def reset_traj_stats(self, state: RolloutState) -> RolloutState:
        """Clear the completed-trajectory window (called at log intervals)."""
        return state._replace(traj_stats=TrajStats.zeros())

    def evaluate(self, params, key: jax.Array, max_T: int,
                 max_trajectories: Optional[int] = None) -> TrajStats:
        """Offline evaluation with rlpyt's eval-collector discipline
        (rlpyt/samplers/serial/collectors.py:SerialEvalCollector ~L10-90):
        fresh envs, eval-mode agent, stats only over COMPLETED
        trajectories (running episodes at the cap are discarded), and —
        unlike a fixed-length scan — stepping STOPS as soon as
        ``max_trajectories`` is reached (lax.while_loop, so no wasted
        device compute past the cap; rlpyt's serve loop breaks the same
        way on its traj counter)."""
        state = self.init_state(key)

        def cond(c):
            t, st = c
            go = t < max_T
            if max_trajectories is not None:
                go = go & (st.traj_stats.completed < max_trajectories)
            return go

        def body(c):
            t, st = c
            st, _ = self._step(params, st, True, max_trajectories)
            return t + 1, st

        _, state = jax.lax.while_loop(
            cond, body, (jnp.zeros((), jnp.int32), state))
        return state.traj_stats


def evaluate(collector: Collector, params, key: jax.Array,
             max_T: int, max_trajectories: Optional[int] = None
             ) -> TrajStats:
    """Module-level convenience wrapper over Collector.evaluate."""
    return collector.evaluate(params, key, max_T, max_trajectories)
