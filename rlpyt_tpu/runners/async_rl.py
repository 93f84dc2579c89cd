"""Asynchronous(-equivalent) runner (reference: rlpyt/runners/async_rl.py:
AsyncRlBase, AsyncRl, AsyncRlEval ~L20-400).

The reference decouples acting from learning with 3+ process roles
(sampler, memory copier, optimizer, master logger) sharing a double
sample buffer + lock-guarded replay, throttled so the replay ratio stays
bounded.  On TPU the roles collapse into one device program (rollout →
append → updates is already fused, so the "memory copier" is a
dynamic_update_slice and the lock does not exist).  What remains worth
reproducing, and is implemented here:

1. **Decoupled rates** — ``updates_per_interval`` is set explicitly
   (AsyncRl's throttle made concrete): the learner takes exactly that
   many update steps per collected interval regardless of batch size
   arithmetic, like the reference's ``updates_per_sync`` bound.
2. **Host/device overlap** — the reference hides logging/eval behind
   sampling in other processes.  Here the host loop keeps up to
   ``pipeline_depth`` interval programs in flight (JAX async dispatch)
   and reads diagnostics one interval late, so host-side CSV/snapshot
   I/O and eval decisions overlap device compute instead of blocking it.

With a host-env farm (envs/host.py) the same runner gives the full
actor/learner overlap story: the feed of interval k+1 uploads while
interval k computes.
"""
from __future__ import annotations

import math
import time
from collections import deque
from typing import Optional

import jax
import numpy as np

from rlpyt_tpu.runners.train import MinibatchRl, TrainCarry


class AsyncRl(MinibatchRl):
    """Pipelined runner with explicit replay-ratio throttle."""

    def __init__(self, *args, updates_per_interval: Optional[int] = None,
                 pipeline_depth: int = 2,
                 checkpoint_every: Optional[int] = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.updates_per_interval = updates_per_interval
        self.pipeline_depth = max(1, pipeline_depth)
        # Checkpointing must block on the newest carry, draining the
        # pipeline — so it runs every ``checkpoint_every`` intervals
        # (default: 4x pipeline depth, amortizing the stall) plus once
        # at the end, not per interval.
        self.checkpoint_every = (checkpoint_every if checkpoint_every
                                 is not None else 4 * self.pipeline_depth)

    def startup(self) -> TrainCarry:
        carry = super().startup()
        if self.updates_per_interval is not None:
            # Override the algo's replay-ratio arithmetic with the
            # explicit async throttle (reference: AsyncRlBase ~L250
            # optimizer wait/updates_per_sync).
            per_itr = max(1, self.updates_per_interval
                          // self.itrs_per_interval)
            self.algo.updates_per_optimize = per_itr
            # Re-jit: updates_per_optimize is baked into the program.
            self._run_interval = jax.jit(self._interval_fn,
                                         donate_argnums=0)
        return carry

    def train(self, resume_from: Optional[str] = None) -> TrainCarry:
        carry = self.startup()
        steps_per_interval = self.itrs_per_interval * self.batch_spec.size
        n_intervals = max(1, math.ceil(self.n_itr / self.itrs_per_interval))
        start_interval = 0
        if resume_from is not None:
            from rlpyt_tpu.utils.checkpoint import load_checkpoint
            carry, meta = load_checkpoint(resume_from, like=carry)
            start_interval = int(meta.get("interval", 0))
        self.logger.log(
            f"Async training: {n_intervals} intervals x "
            f"{self.itrs_per_interval} itrs, pipeline depth "
            f"{self.pipeline_depth}")
        t_start = time.time()

        # (interval, opt_infos, traj_stats, eval_stats, t0); eval is
        # DISPATCHED at enqueue time against that interval's own params
        # (single device stream: it executes before the next interval
        # program can donate/overwrite them), so the logged Eval* keys
        # belong to the interval they are reported with — fetched lazily
        # at drain so the pipeline stays full.
        in_flight: deque = deque()
        for interval in range(start_interval, n_intervals):
            t0 = time.time()
            carry, opt_infos, traj_stats = self._run_interval(carry)
            eval_stats = None
            if self.eval_env is not None:
                k_eval = jax.random.fold_in(
                    jax.random.key(self.seed + 1), interval)
                eval_stats = self._run_eval(carry.train_state.params,
                                            k_eval)
            in_flight.append((interval, opt_infos, traj_stats,
                              eval_stats, t0))
            # Drain completed intervals without stalling the device queue.
            while (len(in_flight) > self.pipeline_depth - 1
                   or interval == n_intervals - 1) and in_flight:
                itv, infos, stats, estats, ti = in_flight.popleft()
                jax.block_until_ready(infos.loss)
                t1 = time.time()
                cum = (itv + 1) * steps_per_interval
                itr = (itv + 1) * self.itrs_per_interval
                self._log_diagnostics(itr, cum, infos, stats,
                                      t1 - ti, t1 - t_start)
                if estats is not None:
                    self._log_traj_stats("Eval", estats)
                    self.logger.dump_tabular()
            if (self.checkpoint_dir is not None and self.checkpoint_every
                    and (interval + 1) % self.checkpoint_every == 0):
                from rlpyt_tpu.utils.checkpoint import save_checkpoint
                jax.block_until_ready(carry.train_state.params)
                save_checkpoint(
                    f"{self.checkpoint_dir}/checkpoint.pkl", carry,
                    {"interval": interval + 1,
                     "cum_steps": (interval + 1) * steps_per_interval})
        jax.block_until_ready(carry.train_state.params)
        if self.checkpoint_dir is not None:
            from rlpyt_tpu.utils.checkpoint import save_checkpoint
            save_checkpoint(
                f"{self.checkpoint_dir}/checkpoint.pkl", carry,
                {"interval": n_intervals,
                 "cum_steps": n_intervals * steps_per_interval})
        return carry


class AsyncRlEval(AsyncRl):
    """(rlpyt/runners/async_rl.py:AsyncRlEval)."""

    def __init__(self, *args, eval_env=None, **kwargs):
        if eval_env is None:
            raise ValueError("AsyncRlEval requires eval_env")
        super().__init__(*args, eval_env=eval_env, **kwargs)
