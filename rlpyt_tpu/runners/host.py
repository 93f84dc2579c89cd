"""Host-env training runner (reference: rlpyt/samplers/parallel/gpu/
sampler.py:GpuSampler + action_server.py:ActionServer.serve_actions, and
rlpyt/runners/minibatch_rl.py for the loop).

For environments that live on the host (gymnasium MuJoCo, ALE), the
rollout is a host loop: workers step envs into shared memory while the
device runs one batched ``agent.step`` per timestep — exactly rlpyt's
GPU action-server topology, with JAX async dispatch giving the overlap
the reference built from semaphores.  Optimization consumes the
assembled [T, B] batch with the same jitted ``algo.optimize`` used by
the on-device path, so every algorithm works unchanged on host envs.
"""
from __future__ import annotations

import math
import time
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rlpyt_tpu.agents.base import StepCtx
from rlpyt_tpu.envs.host import PairedVecEnv
from rlpyt_tpu.samplers.rollout import BatchSpec, Samples
from rlpyt_tpu.utils.logging import TabularLogger


class _TrajAccum:
    """Host-side per-trajectory accumulators (rlpyt
    samplers/collections.py:TrajInfo ~L40: Length, Return,
    NonzeroRewards, DiscountedReturn; + AtariTrajInfo.GameScore),
    vectorized over env lanes.

    A trajectory completes on ``traj_done`` (true game over), not on
    ``done``: under episodic lives the life-loss done resets value
    bootstrapping and rnn state but the TrajInfo keeps accumulating
    across lives, exactly like rlpyt's collectors which only terminate
    the TrajInfo when ``env_info.traj_done``."""

    KEYS = ("Return", "Length", "NonzeroRewards", "DiscountedReturn",
            "GameScore")

    def __init__(self, B: int, discount: float = 1.0):
        self.discount = float(discount)
        self.ret = np.zeros((B,), np.float64)
        self.length = np.zeros((B,), np.int64)
        self.nonzero = np.zeros((B,), np.int64)
        self.disc_ret = np.zeros((B,), np.float64)
        self.cur_disc = np.ones((B,), np.float64)
        self.score = np.zeros((B,), np.float64)
        self.window: list = []

    def step(self, sl: slice, rew, done, info: Dict[str, np.ndarray]):
        """Accumulate one timestep for lanes [sl]; ``rew``/``done`` and
        the info arrays are already sliced to those lanes."""
        rew = np.asarray(rew)
        done = np.asarray(done)
        self.ret[sl] += rew
        self.disc_ret[sl] += self.cur_disc[sl] * rew
        self.cur_disc[sl] *= self.discount
        self.length[sl] += 1
        self.nonzero[sl] += rew != 0
        score = (np.asarray(info["game_score"], np.float64)
                 if "game_score" in info else rew)
        self.score[sl] += score
        traj_done = (np.asarray(info["traj_done"])
                     if "traj_done" in info else done)
        base = sl.start or 0
        for b in np.nonzero(traj_done)[0]:
            g = base + b
            self.window.append((self.ret[g], self.length[g],
                                self.nonzero[g], self.disc_ret[g],
                                self.score[g]))
            self.ret[g] = self.length[g] = self.nonzero[g] = 0
            self.disc_ret[g] = self.score[g] = 0.0
            self.cur_disc[g] = 1.0

    def pop(self) -> list:
        w = self.window
        self.window = []
        return w


def _log_window(rec, prefix: str, window: list, has_score: bool,
                last: dict = None):
    """Tabular keys matching rlpyt's TrajInfo columns (runners/
    minibatch_rl.py:log_diagnostics ~L250).  ``last``: caller-owned
    cache; an empty window (no episode completed this interval — e.g.
    freeway's 2500-step episodes vs a shorter log window) re-emits the
    previous completed window's values instead of NaN, with Trajs=0
    still marking it empty."""
    rec(prefix + "Trajs", len(window))
    keys = [("ReturnAverage", 0, np.mean), ("ReturnStd", 0, np.std),
            ("ReturnMax", 0, np.max),
            ("ReturnMin", 0, np.min), ("LengthAverage", 1, np.mean),
            ("NonzeroRewardsAverage", 2, np.mean),
            ("DiscountedReturnAverage", 3, np.mean)]
    if has_score:
        keys += [("GameScoreAverage", 4, np.mean),
                 ("GameScoreMax", 4, np.max)]
    if window:
        vals = {name: float(fn([x[i] for x in window]))
                for name, i, fn in keys}
        if last is not None:
            last[prefix] = vals
    else:
        vals = (last or {}).get(
            prefix, {name: float("nan") for name, _, _ in keys})
    for name, _, _ in keys:
        rec(prefix + name, vals[name])


class HostRolloutState(NamedTuple):
    """Device-side view of the host rollout frontier — the fields algos
    read from the on-device RolloutState (bootstrap obs, cum steps)."""

    observation: Any
    prev_action: Any
    prev_reward: jax.Array
    agent_carry: Any
    cum_steps: jax.Array


class HostMinibatchRl:
    """Collect [T, B] batches from a host vec-env; optimize on device."""

    def __init__(self, algo, agent, vec_env, batch_T: int, n_steps: int,
                 seed: int = 0, log_interval_steps: int = int(1e5),
                 logger: Optional[TabularLogger] = None,
                 eval_vec_env=None, eval_max_steps: int = 2_500,
                 eval_max_trajectories: Optional[int] = None):
        self.algo = algo
        self.agent = agent
        self.vec = vec_env
        self.batch_spec = BatchSpec(batch_T, vec_env.B)
        self.n_steps = int(n_steps)
        self.seed = seed
        self.log_interval_steps = int(log_interval_steps)
        self.logger = logger or TabularLogger(None)
        self.eval_vec = eval_vec_env
        self.eval_max_steps = eval_max_steps
        self.eval_max_trajectories = eval_max_trajectories

    # ------------------------------------------------------------------

    def startup(self):
        key = jax.random.key(self.seed)
        self._k_agent, self._k_algo, k_init = jax.random.split(key, 3)
        self.agent.initialize(self.vec.spaces)
        T, B = self.batch_spec
        obs0 = jax.tree.map(np.array, self.vec.reset())
        self.n_itr = max(1, math.ceil(self.n_steps / self.batch_spec.size))
        self.itrs_per_interval = max(
            1, self.log_interval_steps // self.batch_spec.size)

        obs_dev = jax.tree.map(jnp.asarray, obs0)
        train_state, replay_state = self.algo.initialize(
            self.agent, self.batch_spec, obs_dev, k_init, n_itr=self.n_itr)

        act_null = np.asarray(self.vec.spaces.action.null_value())
        self._prev_action = np.broadcast_to(
            act_null, (B,) + act_null.shape).copy()
        self._prev_reward = np.zeros((B,), np.float32)
        self._carry = self.agent.init_carry(B)

        def step_fn(params, key, obs, prev_a, prev_r, carry, cum):
            ctx = StepCtx(cum_steps=cum, is_eval=False)
            return self.agent.step(params, key, obs, prev_a, prev_r,
                                   carry, ctx)

        self._step_fn = jax.jit(step_fn)
        if isinstance(self.vec, PairedVecEnv):
            self._alt_carry = [self.agent.init_carry(h.B)
                               for h in self.vec.halves]

        def eval_step_fn(params, key, obs, prev_a, prev_r, carry, cum):
            ctx = StepCtx(cum_steps=cum, is_eval=True)
            return self.agent.step(params, key, obs, prev_a, prev_r,
                                   carry, ctx)

        self._eval_step_fn = jax.jit(eval_step_fn)
        self._optimize = jax.jit(self.algo.optimize, donate_argnums=(0, 1))
        self._cum_steps = 0
        # trajectory accounting (host-side TrajInfo parity; discount
        # from the algo like rlpyt's traj_info_kwargs, minibatch_rl.py
        # startup ~L90)
        self._traj = _TrajAccum(
            B, discount=float(getattr(self.algo, "discount", 1.0)))
        self._has_score = "game_score" in getattr(self.vec, "info", {})
        return train_state, replay_state

    # ------------------------------------------------------------------

    def _collect_batch(self, params):
        """One [T, B] batch: the action-server loop
        (rlpyt ActionServer.serve_actions ~L15)."""
        if isinstance(self.vec, PairedVecEnv):
            return self._collect_batch_alternating(params)
        T, B = self.batch_spec
        (obs_l, act_l, rew_l, done_l, to_l, pa_l, pr_l,
         info_l) = ([] for _ in range(8))
        einfo_l = {k: [] for k in getattr(self.vec, "info", {})}
        obs = self.vec.obs
        for t in range(T):
            self._k_agent, k = jax.random.split(self._k_agent)
            obs_t = jax.tree.map(np.array, obs)  # snapshot before the env overwrites
            astep, self._carry = self._step_fn(
                params, k, jax.tree.map(jnp.asarray, obs_t),
                jnp.asarray(self._prev_action),
                jnp.asarray(self._prev_reward), self._carry,
                jnp.asarray(self._cum_steps + t * B, jnp.int32))
            actions = np.asarray(astep.action)
            obs, rew, done, timeout = self.vec.step(actions)
            env_info = getattr(self.vec, "info", {})

            obs_l.append(obs_t)
            act_l.append(actions)
            rew_l.append(np.array(rew))
            done_l.append(np.array(done))
            to_l.append(np.array(timeout))
            pa_l.append(self._prev_action.copy())
            pr_l.append(self._prev_reward.copy())
            info_l.append(jax.device_get(astep.agent_info))
            for k_, v in env_info.items():
                einfo_l[k_].append(np.array(v))

            # episode stats + prev for next step (auto-reset zeroing)
            self._traj.step(slice(0, B), rew, done, env_info)
            self._prev_action = np.where(
                done.reshape((B,) + (1,) * (actions.ndim - 1)),
                np.zeros_like(actions), actions)
            self._prev_reward = np.where(done, 0.0, rew).astype(np.float32)
            if self.agent.recurrent:
                self._carry = self.agent.reset_carry_where(
                    jnp.asarray(done), self._carry)

        self._cum_steps += T * B
        agent_info = {}
        if info_l and jax.tree_util.tree_leaves(info_l[0]):
            # Stack per-step agent_info as a pytree (nested DistInfo structs
            # must survive — np.asarray would fold tuple structure into a
            # spurious leading axis).
            agent_info = jax.tree.map(
                lambda *xs: jnp.asarray(np.stack(xs)), *info_l)
        samples = Samples(
            observation=jax.tree.map(
                lambda *xs: jnp.asarray(np.stack(xs)), *obs_l),
            action=jnp.asarray(np.stack(act_l)),
            reward=jnp.asarray(np.stack(rew_l)),
            done=jnp.asarray(np.stack(done_l)),
            prev_action=jnp.asarray(np.stack(pa_l)),
            prev_reward=jnp.asarray(np.stack(pr_l)),
            agent_info=agent_info,
            env_info={"timeout": jnp.asarray(np.stack(to_l)),
                      **{k: jnp.asarray(np.stack(v))
                         for k, v in einfo_l.items()}},
        )
        rollout_state = HostRolloutState(
            observation=jax.tree.map(
                lambda x: jnp.asarray(np.array(x)), self.vec.obs),
            prev_action=jnp.asarray(self._prev_action),
            prev_reward=jnp.asarray(self._prev_reward),
            agent_carry=self._carry,
            cum_steps=jnp.asarray(self._cum_steps, jnp.int32),
        )
        return samples, rollout_state

    # ------------------------------------------------------------------

    def _collect_batch_alternating(self, params):
        """Alternating collection (rlpyt samplers/parallel/gpu/
        alternating_sampler.py:AlternatingSampler + its action servers
        ~L100): env halves step out of phase so each half's host env
        simulation overlaps the device inference of the other half.

        The reference builds the overlap from out-of-phase worker groups
        and semaphore pairs; here it rides JAX async dispatch — a half's
        inference is dispatched (non-blocking), the *other* half's envs
        are stepped while the device works, and the action future is
        fetched only afterwards.  Recurrent agents keep two carry banks
        (rlpyt agents/base.py:AlternatingRecurrentAgentMixin ~L250).
        """
        T, Btot = self.batch_spec
        halves = self.vec.halves
        b_a = halves[0].B
        sl = (slice(0, b_a), slice(b_a, Btot))
        h_obs = [jax.tree.map(np.array, h.obs) for h in halves]
        recs = [{k: [] for k in ("obs", "act", "rew", "done", "to",
                                 "pa", "pr")} for _ in range(2)]
        infos = ([], [])
        einfos = ({}, {})  # farm info keys, per half: key -> [t] lists

        def dispatch(h, t):
            self._k_agent, k = jax.random.split(self._k_agent)
            return self._step_fn(
                params, k, jax.tree.map(jnp.asarray, h_obs[h]),
                jnp.asarray(self._prev_action[sl[h]]),
                jnp.asarray(self._prev_reward[sl[h]]),
                self._alt_carry[h],
                jnp.asarray(self._cum_steps + t * Btot, jnp.int32))

        def land(h, astep):
            """Fetch the half's action future, step its envs, update its
            slice of the prev/episode bookkeeping."""
            actions = np.asarray(astep.action)  # blocks on the device
            rec = recs[h]
            rec["obs"].append(jax.tree.map(np.copy, h_obs[h]))
            rec["act"].append(actions)
            rec["pa"].append(self._prev_action[sl[h]].copy())
            rec["pr"].append(self._prev_reward[sl[h]].copy())
            infos[h].append(jax.device_get(astep.agent_info))
            obs, rew, done, timeout = halves[h].step(actions)
            h_obs[h] = jax.tree.map(np.array, obs)
            rew = np.array(rew)
            done = np.array(done)
            rec["rew"].append(rew)
            rec["done"].append(done)
            rec["to"].append(np.array(timeout))
            env_info = getattr(halves[h], "info", {})
            for k_, v in env_info.items():
                einfos[h].setdefault(k_, []).append(np.array(v))
            self._traj.step(sl[h], rew, done, env_info)
            self._prev_action[sl[h]] = np.where(
                done.reshape(done.shape + (1,) * (actions.ndim - 1)),
                np.zeros_like(actions), actions)
            self._prev_reward[sl[h]] = np.where(done, 0.0, rew)
            if self.agent.recurrent:
                self._alt_carry[h] = self.agent.reset_carry_where(
                    jnp.asarray(done), self._alt_carry[h])

        fut_a = dispatch(0, 0)
        for t in range(T):
            astep_a, self._alt_carry[0] = fut_a
            fut_b = dispatch(1, t)       # device: half b, step t
            land(0, astep_a)             # host: half a envs ∥ device b
            astep_b, self._alt_carry[1] = fut_b
            if t < T - 1:
                fut_a = dispatch(0, t + 1)   # device: half a, step t+1
            land(1, astep_b)             # host: half b envs ∥ device a

        self._cum_steps += T * Btot

        def tb(key, dtype=None):
            arr = np.stack([np.concatenate([a, b]) for a, b in
                            zip(recs[0][key], recs[1][key])])
            return jnp.asarray(arr if dtype is None
                               else arr.astype(dtype))

        agent_info = {}
        if infos[0] and jax.tree_util.tree_leaves(infos[0][0]):
            stacked = [jax.tree.map(lambda *xs: np.stack(xs), *infos[h])
                       for h in range(2)]
            agent_info = jax.tree.map(
                lambda a, b: jnp.asarray(np.concatenate([a, b], axis=1)),
                *stacked)
        obs_stacked = [
            jax.tree.map(lambda *xs: np.stack(xs), *recs[h]["obs"])
            for h in range(2)]
        samples = Samples(
            observation=jax.tree.map(
                lambda a, b: jnp.asarray(np.concatenate([a, b], axis=1)),
                *obs_stacked),
            action=tb("act"),
            reward=tb("rew", np.float32), done=tb("done"),
            prev_action=tb("pa"), prev_reward=tb("pr", np.float32),
            agent_info=agent_info,
            # forward ALL farm info keys (game_score, traj_done, ...) so
            # the sample schema matches the non-alternating path — an ALE
            # farm under PairedVecEnv must not lose AtariTrajInfo fields
            # (rlpyt AlternatingSampler keeps the same Samples schema).
            env_info={"timeout": tb("to"), **self._merge_einfos(einfos)},
        )
        carry = jax.tree.map(lambda a, b: jnp.concatenate([a, b]),
                             self._alt_carry[0], self._alt_carry[1])
        rollout_state = HostRolloutState(
            observation=jax.tree.map(
                lambda a, b: jnp.asarray(np.concatenate([a, b])), *h_obs),
            prev_action=jnp.asarray(self._prev_action),
            prev_reward=jnp.asarray(self._prev_reward),
            agent_carry=carry,
            cum_steps=jnp.asarray(self._cum_steps, jnp.int32),
        )
        return samples, rollout_state

    # ------------------------------------------------------------------

    @staticmethod
    def _merge_einfos(einfos):
        """Merge the two halves' env_info records into full-B arrays.
        The halves step the same EnvCls, so their info schemas must
        agree — assert it (a key present in only one half would
        otherwise be silently dropped or raise a bare KeyError, and
        zip() would silently truncate on length divergence)."""
        if set(einfos[0]) != set(einfos[1]):
            raise ValueError(
                "alternating halves produced different env_info schemas: "
                f"{sorted(einfos[0])} vs {sorted(einfos[1])}")
        out = {}
        for k in einfos[0]:
            a_list, b_list = einfos[0][k], einfos[1][k]
            if len(a_list) != len(b_list):
                raise ValueError(
                    f"alternating halves recorded env_info[{k!r}] at "
                    f"different lengths: {len(a_list)} vs {len(b_list)}")
            out[k] = jnp.asarray(np.stack(
                [np.concatenate([a, b]) for a, b in zip(a_list, b_list)]))
        return out

    def _evaluate(self, params):
        """Offline evaluation on ``eval_vec_env`` (reference:
        rlpyt/samplers/parallel/cpu/collectors.py:CpuEvalCollector and
        BaseSampler's eval_max_steps / eval_max_trajectories caps):
        eval-mode actions, capped by total env-steps and by completed
        trajectories; episodes still running at the cap are discarded."""
        vec = self.eval_vec
        B = vec.B
        obs = jax.tree.map(np.array, vec.reset())
        act_null = np.asarray(vec.spaces.action.null_value())
        prev_action = np.broadcast_to(
            act_null, (B,) + act_null.shape).copy()
        prev_reward = np.zeros((B,), np.float32)
        carry = self.agent.init_carry(B)
        accum = _TrajAccum(B, discount=self._traj.discount)
        max_T = max(1, self.eval_max_steps // B)
        # Dedicated eval key stream (seed+1, folded per eval) so offline
        # eval NEVER perturbs the training trajectory — with/without
        # eval, collection draws the identical action keys (same
        # discipline as runners/train.py's device eval).
        self._n_evals = getattr(self, "_n_evals", 0) + 1
        k_eval = jax.random.fold_in(jax.random.key(self.seed + 1),
                                    self._n_evals)
        for _ in range(max_T):
            k_eval, k = jax.random.split(k_eval)
            astep, carry = self._eval_step_fn(
                params, k, jax.tree.map(jnp.asarray, obs),
                jnp.asarray(prev_action),
                jnp.asarray(prev_reward), carry,
                jnp.asarray(self._cum_steps, jnp.int32))
            actions = np.asarray(astep.action)
            obs, rew, done, _ = vec.step(actions)
            accum.step(slice(0, B), rew, done, getattr(vec, "info", {}))
            completed = accum.window
            prev_action = np.where(
                done.reshape((B,) + (1,) * (actions.ndim - 1)),
                np.zeros_like(actions), actions)
            prev_reward = np.where(done, 0.0, rew).astype(np.float32)
            if self.agent.recurrent:
                carry = self.agent.reset_carry_where(
                    jnp.asarray(done), carry)
            if (self.eval_max_trajectories is not None
                    and len(completed) >= self.eval_max_trajectories):
                break
        return accum.pop()

    def _log_eval(self, completed):
        if not hasattr(self, "_last_window_vals"):
            self._last_window_vals = {}
        _log_window(self.logger.record_tabular, "Eval", completed,
                    self._has_score, last=self._last_window_vals)

    # ------------------------------------------------------------------

    def train(self):
        train_state, replay_state = self.startup()
        T, B = self.batch_spec
        t_start = time.time()
        interval_itrs = 0
        t0 = time.time()
        for itr in range(self.n_itr):
            samples, rollout_state = self._collect_batch(train_state.params)
            self._k_algo, k = jax.random.split(self._k_algo)
            train_state, replay_state, opt_info = self._optimize(
                train_state, replay_state, samples, k, rollout_state)
            interval_itrs += 1
            if interval_itrs >= self.itrs_per_interval or itr == self.n_itr - 1:
                jax.block_until_ready(train_state.params)
                t1 = time.time()
                eval_eps = (self._evaluate(train_state.params)
                            if self.eval_vec is not None else None)
                self._log(itr + 1, t1 - t0, t1 - t_start, opt_info,
                          eval_eps)
                interval_itrs = 0
                t0 = time.time()
        return train_state, replay_state

    def _log(self, itr, dt, total, opt_info, eval_eps=None):
        rec = self.logger.record_tabular
        rec("Iteration", itr)
        rec("CumSteps", self._cum_steps)
        rec("CumTime (s)", total)
        steps = self.itrs_per_interval * self.batch_spec.size
        rec("StepsPerSecond", steps / dt)
        updates = (self.itrs_per_interval
                   * getattr(self.algo, "updates_per_optimize", 1))
        rec("UpdatesPerSecond", updates / dt)
        batch_size = getattr(self.algo, "batch_size", None)
        if batch_size:
            rec("ReplayRatio", updates * batch_size / steps)
        if not hasattr(self, "_last_window_vals"):
            self._last_window_vals = {}
        _log_window(rec, "", self._traj.pop(), self._has_score,
                    last=self._last_window_vals)
        for field, val in zip(opt_info._fields, opt_info):
            rec(field, float(np.mean(np.asarray(val))))
        if eval_eps is not None:
            self._log_eval(eval_eps)
        self.logger.dump_tabular()


class AsyncHostRl(HostMinibatchRl):
    """Asynchronous actor/learner on the host-env path (reference:
    rlpyt/runners/async_rl.py:AsyncRl ~L20-400 + samplers/async_/
    cpu_sampler.py:AsyncCpuSampler).

    The reference decouples env stepping from optimization with separate
    OS processes (sampler workers collect with a shared-memory CPU model
    copy while optimizer processes train on GPU), bounded in both
    directions by a replay-ratio throttle.  Here the same topology is a
    **learner thread + actor main thread** sharing one process:

    - The **learner thread** pulls collected batches from a depth-1
      queue and runs ``algo.optimize`` on the default (TPU) device; the
      queue gives rlpyt's two-way throttle (actor blocks when the
      learner lags; learner waits when the actor lags).
    - The **actor** (main thread) steps envs and runs inference on a
      separate device (default: a host-CPU device) so its per-step
      dispatches never queue behind the in-flight optimize program.
      After each optimize the learner publishes a params copy onto the
      actor device; the actor picks up the newest at batch start —
      staleness is bounded by the queue depth (≤2 batches), rlpyt's
      stale-shared-model semantics made explicit.

    ``updates_per_optimize`` overrides the algo's replay-ratio
    arithmetic the way the reference's ``updates_per_sync`` bound does.
    """

    def __init__(self, *args, actor_device=None,
                 updates_per_optimize: Optional[int] = None, **kwargs):
        super().__init__(*args, **kwargs)
        self._actor_device_arg = actor_device
        self._updates_override = updates_per_optimize

    def _pick_actor_device(self):
        if self._actor_device_arg is not None:
            return self._actor_device_arg
        default = jax.devices()[0]
        try:
            cpus = jax.devices("cpu")
        except RuntimeError:
            cpus = []
        if default.platform != "cpu" and cpus:
            return cpus[0]
        if len(cpus) > 1:
            return cpus[-1]  # virtual-mesh testing: separate CPU stream
        return default

    def _to_actor(self, tree):
        """Copy to the actor device.  When actor and learner share ONE
        device (plain single-CPU runs), device_put is a no-op VIEW and
        the learner's donated optimize would invalidate the actor's
        params mid-step — force a real copy there."""
        if self._actor_device == self._learner_device:
            return jax.tree.map(jnp.copy, tree)
        return jax.device_put(tree, self._actor_device)

    def startup(self):
        if self._updates_override is not None:
            self.algo.updates_per_optimize = int(self._updates_override)
        train_state, replay_state = super().startup()
        self._learner_device = jax.devices()[0]
        self._actor_device = self._pick_actor_device()
        self._actor_params = self._to_actor(train_state.params)
        self._carry = jax.device_put(self._carry, self._actor_device)
        if isinstance(self.vec, PairedVecEnv):
            self._alt_carry = [jax.device_put(c, self._actor_device)
                               for c in self._alt_carry]
        return train_state, replay_state

    def train(self):
        import queue
        import threading

        train_state, replay_state = self.startup()
        batch_q: queue.Queue = queue.Queue(maxsize=1)
        result = {}
        err: list = []
        published = {"params": self._actor_params, "opt_info": None,
                     "done_itrs": 0}
        lock = threading.Lock()

        def learner():
            ts, rs = train_state, replay_state
            try:
                for itr in range(self.n_itr):
                    samples, rollout_state, k = batch_q.get()
                    rollout_state = jax.device_put(rollout_state,
                                                   self._learner_device)
                    ts, rs, opt_info = self._optimize(
                        ts, rs, samples, k, rollout_state)
                    actor_params = self._to_actor(ts.params)
                    # Block here (learner thread), not on the actor:
                    # publishing only ready params keeps actor dispatch
                    # free of in-flight learner dependencies.
                    jax.block_until_ready(actor_params)
                    with lock:
                        published["params"] = actor_params
                        published["opt_info"] = opt_info
                        published["done_itrs"] = itr + 1
                result["train_state"] = ts
                result["replay_state"] = rs
            except BaseException as e:  # surface in the main thread
                err.append(e)

        thread = threading.Thread(target=learner, daemon=True)
        thread.start()

        t_start = time.time()
        interval_itrs = 0
        t0 = time.time()
        for itr in range(self.n_itr):
            with lock:
                params = published["params"]
            samples, rollout_state = self._collect_batch(params)
            self._k_algo, k = jax.random.split(self._k_algo)
            if err:
                raise err[0]
            batch_q.put((samples, rollout_state, k))
            interval_itrs += 1
            if (interval_itrs >= self.itrs_per_interval
                    or itr == self.n_itr - 1):
                t1 = time.time()
                with lock:
                    opt_info = published["opt_info"]
                    params = published["params"]
                eval_eps = (self._evaluate(params)
                            if self.eval_vec is not None else None)
                if opt_info is not None:
                    self._log(itr + 1, t1 - t0, t1 - t_start, opt_info,
                              eval_eps)
                interval_itrs = 0
                t0 = time.time()
        thread.join()
        if err:
            raise err[0]
        return result["train_state"], result["replay_state"]
