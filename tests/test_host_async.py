"""AsyncHostRl: actor/learner overlap on the host-env path (reference:
rlpyt/runners/async_rl.py:AsyncRl + samplers/async_/cpu_sampler.py:
AsyncCpuSampler — env stepping overlaps optimization, actor params lag
the learner by a bounded amount)."""
import time

import jax
import numpy as np
import pytest

from rlpyt_tpu.envs.host import SerialVecEnv, GymEnv
from rlpyt_tpu.runners.host import AsyncHostRl, HostMinibatchRl


def _cartpole_fns(n):
    return [lambda: GymEnv("CartPole-v1") for _ in range(n)]


class _SleepyVecEnv(SerialVecEnv):
    """CartPole farm with synthetic per-step latency, standing in for a
    slow simulator (MuJoCo-class)."""

    def __init__(self, *args, sleep_s=0.0, **kwargs):
        super().__init__(*args, **kwargs)
        self._sleep_s = sleep_s

    def step(self, actions):
        time.sleep(self._sleep_s)
        return super().step(actions)


def _make_dqn():
    from rlpyt_tpu.agents.dqn import DqnAgent
    from rlpyt_tpu.algos.dqn import DQN
    from rlpyt_tpu.models.dqn import DqnMlpModel
    agent = DqnAgent(ModelCls=DqnMlpModel,
                     model_kwargs={"hidden_sizes": (32,)}, eps_steps=2_000)
    algo = DQN(batch_size=32, min_steps_learn=64, replay_size=10_000,
               replay_ratio=1.0, learning_rate=1e-3)
    return agent, algo


def _sleepy_scalar(x, seconds):
    """A jit-compatible op that charges ``seconds`` of wall time to the
    stream executing it (simulated heavy optimize)."""
    def cb(y):
        time.sleep(seconds)
        return np.asarray(y)
    return jax.pure_callback(cb, jax.ShapeDtypeStruct(x.shape, x.dtype), x)


def _slow_down_optimize(runner, seconds):
    orig = runner._optimize
    sleep_fn = jax.jit(lambda x: _sleepy_scalar(x, seconds))

    def slow_optimize(ts, rs, samples, k, ro):
        ts, rs, oi = orig(ts, rs, samples, k, ro)
        return ts, rs, oi._replace(loss=sleep_fn(oi.loss))

    runner._optimize = slow_optimize


@pytest.mark.slow
def test_async_overlap_speedup():
    """Env stepping for batch k+1 overlaps the learner's optimize of
    batch k: with env time ~= optimize time, the async runner must beat
    the strictly serial collect->optimize loop by >=1.3x steady-state
    env-steps/s (VERDICT round 1 item #5's acceptance bar).  Measured
    from the LAST log interval's StepsPerSecond so jit-compile time
    (first interval) doesn't dilute the ratio."""
    B, T = 4, 8
    n_steps = 24 * B * T  # 24 itrs: 3 log intervals of 8
    env_sleep = 0.02  # per vec step -> ~160 ms per batch
    opt_sleep = 0.16  # comparable simulated learner time

    sps = {}
    for name, cls in (("serial", HostMinibatchRl), ("async", AsyncHostRl)):
        vec = _SleepyVecEnv(_cartpole_fns(B), seed=0, sleep_s=env_sleep)
        agent, algo = _make_dqn()
        runner = cls(algo=algo, agent=agent, vec_env=vec, batch_T=T,
                     n_steps=n_steps, seed=0,
                     log_interval_steps=8 * B * T)
        ts, rs = runner.startup()
        _slow_down_optimize(runner, opt_sleep)
        runner.startup = lambda ts=ts, rs=rs: (ts, rs)
        rates = []
        orig_rec = runner.logger.record_tabular

        def spy_rec(key, value, _rates=rates, _orig=orig_rec):
            if key == "StepsPerSecond":
                _rates.append(float(value))
            _orig(key, value)

        runner.logger.record_tabular = spy_rec
        runner.train()
        sps[name] = rates[-1]
        vec.close()

    speedup = sps["async"] / sps["serial"]
    assert speedup >= 1.3, f"overlap speedup {speedup:.2f}x, sps={sps}"


def test_async_param_lag_is_bounded():
    """The actor params used to collect batch k are the learner params
    after j optimizes for some j in [k-2, k], monotone in k (bounded
    staleness; rlpyt async actors read a shared model whose freshness is
    bounded by the replay-ratio throttle the same way)."""
    B, T = 4, 8
    vec = SerialVecEnv(_cartpole_fns(B), seed=1)
    agent, algo = _make_dqn()
    runner = AsyncHostRl(algo=algo, agent=agent, vec_env=vec, batch_T=T,
                         n_steps=8 * B * T, seed=1,
                         log_interval_steps=8 * B * T)

    collected_with = []
    learner_params = []
    orig_collect = runner._collect_batch

    def probe_leaf(params):
        return np.asarray(jax.tree_util.tree_leaves(params)[0]).copy()

    def spying_collect(params):
        collected_with.append(probe_leaf(params))
        return orig_collect(params)

    runner._collect_batch = spying_collect

    orig_startup = runner.startup

    def spying_startup():
        ts, rs = orig_startup()
        learner_params.append(probe_leaf(ts.params))  # init params
        orig_opt = runner._optimize

        def spying_opt(ts, rs, samples, k, ro):
            ts, rs, oi = orig_opt(ts, rs, samples, k, ro)
            learner_params.append(probe_leaf(ts.params))
            return ts, rs, oi

        runner._optimize = spying_opt
        return ts, rs

    runner.startup = spying_startup
    runner.train()
    vec.close()

    # Batch k is collected while at most optimizes k-1, k-2 are still in
    # flight (queue depth 1): the params used must be the learner's
    # post-optimize-j params for some j in [max(0, k-2), k], monotone.
    assert len(collected_with) >= 3
    for k, used in enumerate(collected_with):
        matches = [j for j, lp in enumerate(learner_params)
                   if lp.shape == used.shape and np.array_equal(lp, used)]
        assert matches, f"batch {k}: actor params match no learner params"
        # (duplicate entries while min_steps_learn gates updates make
        # several j valid; any j inside the staleness window passes)
        assert any(max(0, k - 2) <= j <= k for j in matches), (
            f"batch {k} used params from {matches}, outside [{k-2},{k}]")


@pytest.mark.slow
def test_async_host_learns_cartpole():
    from rlpyt_tpu.agents.dqn import DqnAgent
    from rlpyt_tpu.algos.dqn import DQN
    from rlpyt_tpu.models.dqn import DqnMlpModel

    vec = SerialVecEnv(_cartpole_fns(8), seed=3)
    agent = DqnAgent(ModelCls=DqnMlpModel,
                     model_kwargs={"hidden_sizes": (64, 64)},
                     eps_steps=10_000, eps_final=0.02)
    algo = DQN(batch_size=64, min_steps_learn=500, replay_size=50_000,
               replay_ratio=8.0, learning_rate=5e-4,
               target_update_interval=300)
    runner = AsyncHostRl(algo=algo, agent=agent, vec_env=vec, batch_T=16,
                         n_steps=40_000, seed=3,
                         log_interval_steps=10_000)
    averages = []
    orig_rec = runner.logger.record_tabular

    def spy_rec(key, value):
        if key == "ReturnAverage":
            averages.append(float(value))
        orig_rec(key, value)

    runner.logger.record_tabular = spy_rec
    runner.train()
    vec.close()
    assert averages and averages[-1] > 120.0, f"returns {averages}"
