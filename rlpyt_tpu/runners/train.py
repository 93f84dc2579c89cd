"""Training runners (reference: rlpyt/runners/minibatch_rl.py:MinibatchRl,
MinibatchRlEval ~L15-350).

The reference's hot loop lives on the host: obtain_samples → optimize_agent
per iteration, with device crossings inside each.  Here the whole interval
between log points runs as ONE device program: ``lax.scan`` over training
iterations, each iteration = rollout-scan + replay append + update-scan.
Only small scalar diagnostics cross to the host per interval — the Podracer
("Anakin") topology.  The carry (params, opt state, env states, replay) is
donated, so HBM is never copied between intervals.
"""
from __future__ import annotations

import math
import os
import time
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rlpyt_tpu.samplers.rollout import (
    BatchSpec,
    Collector,
    RolloutState,
    TrajStats,
)
from rlpyt_tpu.utils.logging import TabularLogger


class TrainCarry(NamedTuple):
    rollout_state: RolloutState
    train_state: Any
    replay_state: Any
    algo_key: jax.Array


class MinibatchRl:
    """Single-stream runner: collect batch → optimize, repeat
    (rlpyt/runners/minibatch_rl.py:MinibatchRl)."""

    def __init__(
        self,
        algo,
        agent,
        env,
        batch_spec: BatchSpec,
        n_steps: int,
        seed: int = 0,
        log_interval_steps: int = int(1e5),
        max_decorrelation_steps: int = 100,
        eval_env=None,
        eval_n_envs: int = 8,
        eval_max_steps: int = 2500,
        eval_max_trajectories: Optional[int] = None,
        logger: Optional[TabularLogger] = None,
        env_params=None,
        checkpoint_dir: Optional[str] = None,
    ):
        self.algo = algo
        self.agent = agent
        self.env = env
        self.batch_spec = batch_spec
        self.n_steps = int(n_steps)
        self.seed = seed
        self.log_interval_steps = int(log_interval_steps)
        self.max_decorrelation_steps = max_decorrelation_steps
        self.eval_env = eval_env
        self.eval_n_envs = eval_n_envs
        self.eval_max_steps = eval_max_steps
        self.eval_max_trajectories = eval_max_trajectories
        self.logger = logger or TabularLogger(None)
        self.env_params = env_params
        self.checkpoint_dir = checkpoint_dir

    # ------------------------------------------------------------------

    def startup(self) -> TrainCarry:
        """(rlpyt MinibatchRlBase.startup ~L60)."""
        key = jax.random.key(self.seed)
        k_agent, k_algo, k_env = jax.random.split(key, 3)

        self.agent.initialize(self.env.spaces)
        traj_discount = float(getattr(self.algo, "discount", 1.0))
        self.collector = Collector(self.env, self.agent, self.batch_spec,
                                   self.env_params,
                                   discount=traj_discount)
        rollout_state = self.collector.init_state(k_env)
        example_obs = rollout_state.observation
        self.n_itr = max(1, math.ceil(self.n_steps / self.batch_spec.size))
        self.itrs_per_interval = max(
            1, self.log_interval_steps // self.batch_spec.size)
        train_state, replay_state = self.algo.initialize(
            self.agent, self.batch_spec, example_obs, k_agent,
            n_itr=self.n_itr)

        if self.max_decorrelation_steps > 0:
            rollout_state = jax.jit(
                self.collector.decorrelate, static_argnums=1)(
                    rollout_state, self.max_decorrelation_steps)

        # --- the jitted interval program --------------------------------
        def one_itr(carry: TrainCarry, _):
            rollout_state, train_state, replay_state, algo_key = carry
            rollout_state, samples = self.collector.collect(
                train_state.params, rollout_state)
            algo_key, k = jax.random.split(algo_key)
            train_state, replay_state, opt_info = self.algo.optimize(
                train_state, replay_state, samples, k, rollout_state)
            return TrainCarry(rollout_state, train_state, replay_state,
                              algo_key), opt_info

        def run_interval(carry: TrainCarry):
            carry, opt_infos = jax.lax.scan(
                one_itr, carry, None, length=self.itrs_per_interval)
            traj_stats = carry.rollout_state.traj_stats
            carry = carry._replace(
                rollout_state=self.collector.reset_traj_stats(
                    carry.rollout_state))
            return carry, opt_infos, traj_stats

        self._interval_fn = run_interval  # kept for re-jitting (SyncRl)
        self._run_interval = jax.jit(run_interval, donate_argnums=0)

        if self.eval_env is not None:
            eval_T = max(1, self.eval_max_steps // self.eval_n_envs)
            self.eval_collector = Collector(
                self.eval_env, self.agent,
                BatchSpec(eval_T, self.eval_n_envs),
                discount=traj_discount)

            def run_eval(params, key):
                if self.eval_max_trajectories is not None:
                    # while_loop eval: stepping STOPS at the traj cap
                    # (rlpyt SerialEvalCollector discipline) instead of
                    # burning device compute to the step cap.
                    return self.eval_collector.evaluate(
                        params, key, eval_T, self.eval_max_trajectories)
                state = self.eval_collector.init_state(key)
                state, _ = self.eval_collector.collect(
                    params, state, is_eval=True)
                return state.traj_stats

            self._run_eval = jax.jit(run_eval)

        return TrainCarry(rollout_state, train_state, replay_state, k_algo)

    # ------------------------------------------------------------------

    def train(self, resume_from: Optional[str] = None) -> TrainCarry:
        """Run to n_steps.  ``resume_from``: path of a full-carry
        checkpoint — resume is bitwise deterministic (the carry holds
        params, opt/replay/env state, and RNG keys; SURVEY.md §5.4)."""
        carry = self.startup()
        steps_per_interval = self.itrs_per_interval * self.batch_spec.size
        n_intervals = max(1, math.ceil(self.n_itr / self.itrs_per_interval))
        start_interval = 0
        if resume_from is not None:
            from rlpyt_tpu.utils.checkpoint import load_checkpoint
            carry, meta = load_checkpoint(resume_from, like=carry)
            start_interval = int(meta.get("interval", 0))
            self.logger.log(f"Resumed from {resume_from} "
                            f"(interval {start_interval})")
        self.logger.log(
            f"Training: {self.n_itr} itrs ({self.n_steps} steps), "
            f"{n_intervals} intervals x {self.itrs_per_interval} itrs")
        t_start = time.time()
        cum_steps = start_interval * steps_per_interval
        for interval in range(start_interval, n_intervals):
            t0 = time.time()
            carry, opt_infos, traj_stats = self._run_interval(carry)
            jax.block_until_ready(carry.train_state.params)
            t1 = time.time()
            cum_steps += steps_per_interval
            itr = (interval + 1) * self.itrs_per_interval
            self._log_diagnostics(itr, cum_steps, opt_infos, traj_stats,
                                  t1 - t0, t1 - t_start)
            self.logger.save_itr_params(
                itr, {"params": carry.train_state.params, "itr": itr,
                      "cum_steps": cum_steps})
            if self.checkpoint_dir is not None:
                from rlpyt_tpu.utils.checkpoint import save_checkpoint
                save_checkpoint(
                    os.path.join(self.checkpoint_dir, "checkpoint.pkl"),
                    carry, {"interval": interval + 1,
                            "cum_steps": cum_steps, "itr": itr})
            if self.eval_env is not None:
                k_eval = jax.random.fold_in(jax.random.key(self.seed + 1),
                                            interval)
                eval_stats = self._run_eval(carry.train_state.params, k_eval)
                self._log_traj_stats("Eval", eval_stats)
                self.logger.dump_tabular()
        return carry

    # ------------------------------------------------------------------

    def _log_traj_stats(self, prefix: str, ts: TrajStats):
        n = int(ts.completed)
        rec = self.logger.record_tabular
        rec(prefix + "Trajs", n)
        keys = ("ReturnAverage", "ReturnStd", "ReturnMax", "ReturnMin",
                "LengthAverage", "NonzeroRewardsAverage",
                "DiscountedReturnAverage")
        if n > 0:
            mean = float(ts.sum_return) / n
            var = max(0.0, float(ts.sum_sq_return) / n - mean * mean)
            vals = (mean, var ** 0.5, float(ts.max_return),
                    float(ts.min_return), float(ts.sum_length) / n,
                    float(ts.sum_nonzero_rewards) / n,
                    float(ts.sum_discounted_return) / n)
            if not hasattr(self, "_last_traj_vals"):
                self._last_traj_vals = {}
            self._last_traj_vals[prefix] = vals
        else:
            # No episode completed this window (long-episode games like
            # freeway): carry the last completed window's stats forward
            # (Trajs=0 still marks the window as empty) instead of
            # polluting the CSV with NaN rows.
            vals = getattr(self, "_last_traj_vals", {}).get(
                prefix, (float("nan"),) * len(keys))
        for k, v in zip(keys, vals):
            rec(prefix + k, v)

    def _log_diagnostics(self, itr, cum_steps, opt_infos, traj_stats,
                         dt_interval, dt_total):
        rec = self.logger.record_tabular
        rec("Iteration", itr)
        rec("CumSteps", cum_steps)
        rec("CumTime (s)", dt_total)
        steps = self.itrs_per_interval * self.batch_spec.size
        rec("StepsPerSecond", steps / dt_interval)
        # rlpyt minibatch_rl.py log_diagnostics ~L250: UpdatesPerSecond
        # and ReplayRatio tabular keys
        updates = (self.itrs_per_interval
                   * getattr(self.algo, "updates_per_optimize", 1))
        rec("UpdatesPerSecond", updates / dt_interval)
        batch_size = getattr(self.algo, "batch_size", None)
        if batch_size:
            rec("ReplayRatio", updates * batch_size / steps)
        self._log_traj_stats("", traj_stats)
        for field, val in zip(opt_infos._fields, opt_infos):
            rec(field, float(np.mean(np.asarray(val))))
        if self.eval_env is None:
            self.logger.dump_tabular()


class MinibatchRlEval(MinibatchRl):
    """Runner with offline eval at log intervals
    (rlpyt/runners/minibatch_rl.py:MinibatchRlEval).  Implemented by
    passing ``eval_env`` to MinibatchRl; this alias keeps the reference's
    class name for API parity."""

    def __init__(self, *args, eval_env=None, **kwargs):
        if eval_env is None:
            raise ValueError("MinibatchRlEval requires eval_env")
        super().__init__(*args, eval_env=eval_env, **kwargs)
