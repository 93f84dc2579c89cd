"""Collector semantics: wait-reset (WaitResetCollector parity) and
eval trajectory caps."""
import jax
import jax.numpy as jnp
import numpy as np

from rlpyt_tpu.agents.base import AgentStep, BaseAgent
from rlpyt_tpu.envs.base import Env, EnvStep
from rlpyt_tpu.samplers.rollout import BatchSpec, Collector
from rlpyt_tpu.spaces import FloatBox, IntBox


class CountEnv(Env):
    """Deterministic: episode of fixed length ``horizon_n`` per env;
    obs = step index; reward = 1."""

    def __init__(self, horizon_n=5):
        self.horizon_n = horizon_n

    @property
    def observation_space(self):
        return FloatBox(0.0, 100.0, shape=(1,))

    @property
    def action_space(self):
        return IntBox(0, 2)

    def reset(self, key, params=None):
        t = jnp.zeros((), jnp.int32)
        return t, jnp.zeros((1,), jnp.float32)

    def step(self, key, state, action, params=None):
        t = state + 1
        done = t >= self.horizon_n
        obs = jnp.asarray([t], jnp.float32)
        return t, EnvStep(obs, jnp.ones((), jnp.float32), done,
                          {"timeout": jnp.zeros((), jnp.bool_)})

    def example_info(self):
        return {"timeout": jnp.zeros((), jnp.bool_)}


class NoopAgent(BaseAgent):
    def initialize(self, env_spaces):
        self.env_spaces = env_spaces

    def init_carry(self, B):
        return None

    def reset_carry_where(self, done, carry):
        return carry

    def step(self, params, key, observation, prev_action, prev_reward,
             carry, ctx):
        B = observation.shape[0]
        return AgentStep(jnp.zeros((B,), jnp.int32), {}), carry


def collect(mid_batch_reset, T=12, B=2, horizon=5):
    env = CountEnv(horizon)
    agent = NoopAgent()
    agent.initialize(env.spaces)
    col = Collector(env, agent, BatchSpec(T, B),
                    mid_batch_reset=mid_batch_reset)
    state = col.init_state(jax.random.key(0))
    state, samples = jax.jit(col.collect)(None, state)
    return state, samples


def test_mid_batch_reset_restarts_episodes():
    state, samples = collect(True)
    obs = np.asarray(samples.observation[:, 0, 0])
    # obs sequence: 0,1,2,3,4 | 0,1,2,3,4 | 0,1 — resets mid-batch
    np.testing.assert_array_equal(obs[:12],
                                  [0, 1, 2, 3, 4, 0, 1, 2, 3, 4, 0, 1])
    assert int(state.traj_stats.completed) == 4  # 2 per env


def test_wait_reset_freezes_done_envs():
    state, samples = collect(False)
    done = np.asarray(samples.done[:, 0])
    # done at step 4 (0-indexed), then frozen-done for the rest
    np.testing.assert_array_equal(done[:4], [False] * 4)
    assert done[4:].all()
    # reward zero while frozen
    rew = np.asarray(samples.reward[:, 0])
    np.testing.assert_array_equal(rew[5:], np.zeros(7))
    # only ONE completed trajectory per env counted
    assert int(state.traj_stats.completed) == 2
    # after collect, env was reset for the next batch
    assert not bool(state.needs_reset.any())
    np.testing.assert_array_equal(np.asarray(state.observation[:, 0]),
                                  [0, 0])


def test_evaluate_while_loop_stops_early():
    """Collector.evaluate (rlpyt SerialEvalCollector discipline): the
    while_loop stops STEPPING at the trajectory cap — completed count
    is near the cap, not the 40 the step budget would allow — and only
    completed trajectories contribute to the stats."""
    env = CountEnv(3)
    agent = NoopAgent()
    agent.initialize(env.spaces)
    col = Collector(env, agent, BatchSpec(30, 4))
    stats = jax.jit(col.evaluate, static_argnums=(2, 3))(
        None, jax.random.key(0), 30, 5)
    completed = int(stats.completed)
    assert 5 <= completed <= 8
    assert abs(float(stats.sum_length) / completed - 3.0) < 1e-5
    # discounted-return stat: with discount=1 it equals plain return
    assert abs(float(stats.sum_discounted_return)
               - float(stats.sum_return)) < 1e-5


def test_discounted_return_stat():
    """DiscountedReturn TrajInfo parity (rlpyt samplers/collections.py
    ~L60): reward 1 per step, 3-step episodes, discount 0.9 →
    1 + .9 + .81 = 2.71 per trajectory."""
    env = CountEnv(3)
    agent = NoopAgent()
    agent.initialize(env.spaces)
    col = Collector(env, agent, BatchSpec(9, 2), discount=0.9)
    state = col.init_state(jax.random.key(0))
    state, _ = jax.jit(col.collect)(None, state)
    ts = state.traj_stats
    n = int(ts.completed)
    assert n == 6  # 3 per env
    assert abs(float(ts.sum_discounted_return) / n - 2.71) < 1e-5


def test_device_eval_path(tmp_path):
    """MinibatchRl offline eval (rlpyt MinibatchRlEval): Eval* columns
    land in progress.csv with finite values when eval_max_trajectories
    is set (the while_loop eval collector path)."""
    import csv

    from rlpyt_tpu.agents.dqn import DqnAgent
    from rlpyt_tpu.algos.dqn import DQN
    from rlpyt_tpu.envs.classic import CartPole
    from rlpyt_tpu.models.dqn import DqnMlpModel
    from rlpyt_tpu.runners.train import MinibatchRl
    from rlpyt_tpu.utils.logging import TabularLogger

    agent = DqnAgent(ModelCls=DqnMlpModel,
                     model_kwargs=dict(hidden_sizes=(32,)),
                     eps_steps=1_000, eps_final=0.1)
    algo = DQN(batch_size=32, min_steps_learn=64, replay_size=2_048,
               replay_ratio=1.0, target_update_interval=50,
               learning_rate=1e-3)
    runner = MinibatchRl(
        algo=algo, agent=agent, env=CartPole(),
        batch_spec=BatchSpec(T=16, B=8), n_steps=512, seed=0,
        log_interval_steps=256, max_decorrelation_steps=0,
        eval_env=CartPole(), eval_n_envs=4, eval_max_steps=2_000,
        eval_max_trajectories=6,
        logger=TabularLogger(str(tmp_path)))
    runner.train()
    with open(tmp_path / "progress.csv") as f:
        rows = list(csv.DictReader(f))
    assert rows
    last = rows[-1]
    assert float(last["EvalTrajs"]) >= 6
    assert np.isfinite(float(last["EvalReturnAverage"]))
    assert np.isfinite(float(last["EvalDiscountedReturnAverage"]))


def test_eval_max_trajectories_cap():
    env = CountEnv(3)
    agent = NoopAgent()
    agent.initialize(env.spaces)
    col = Collector(env, agent, BatchSpec(30, 4))
    state = col.init_state(jax.random.key(0))
    state, _ = jax.jit(col.collect, static_argnums=(2, 3))(
        None, state, True, 5)
    # 30 steps / 3-step episodes x 4 envs = 40 completions possible;
    # the cap freezes accounting at >=5 but close to it (per-step grain)
    completed = int(state.traj_stats.completed)
    assert 5 <= completed <= 8   # one extra step may finish up to B at once
    avg_len = float(state.traj_stats.sum_length) / completed
    assert abs(avg_len - 3.0) < 1e-5


def test_empty_window_carries_last_stats_forward():
    """A log window with no completed episode re-emits the previous
    window's return stats (Trajs=0 still marks it empty) instead of
    NaN — freeway-class games with episodes longer than the log window
    previously produced NaN rows (VERDICT r2 weak #7)."""
    import jax.numpy as jnp
    from rlpyt_tpu.runners.train import MinibatchRl
    from rlpyt_tpu.samplers.rollout import TrajStats

    rec = {}

    class Logger:
        def record_tabular(self, k, v):
            rec[k] = v

        def log(self, *a, **k):
            pass

    runner = MinibatchRl.__new__(MinibatchRl)
    runner.logger = Logger()

    full = TrajStats(
        completed=jnp.asarray(4, jnp.int32),
        sum_return=jnp.asarray(40.0), sum_sq_return=jnp.asarray(420.0),
        sum_length=jnp.asarray(100.0),
        sum_nonzero_rewards=jnp.asarray(12.0),
        sum_discounted_return=jnp.asarray(30.0),
        max_return=jnp.asarray(15.0), min_return=jnp.asarray(5.0))
    runner._log_traj_stats("", full)
    assert rec["Trajs"] == 4 and rec["ReturnAverage"] == 10.0

    runner._log_traj_stats("", TrajStats.zeros())
    assert rec["Trajs"] == 0
    assert rec["ReturnAverage"] == 10.0          # carried forward
    assert rec["ReturnMax"] == 15.0

    # prefixes are independent: an Eval window with no history is NaN
    runner._log_traj_stats("Eval", TrajStats.zeros())
    assert np.isnan(rec["EvalReturnAverage"])


def test_eval_runner_aliases_end_to_end():
    """The reference's *RlEval class names (MinibatchRlEval, SyncRlEval,
    AsyncRlEval) run end-to-end with eval wired and reject a missing
    eval_env (rlpyt runners/minibatch_rl.py ~L300, sync_rl.py,
    async_rl.py Eval variants)."""
    import jax
    import pytest

    from rlpyt_tpu.agents.dqn import DqnAgent
    from rlpyt_tpu.algos.dqn import DQN
    from rlpyt_tpu.envs.classic import CartPole
    from rlpyt_tpu.models.dqn import DqnMlpModel
    from rlpyt_tpu.parallel.mesh import MeshSpec
    from rlpyt_tpu.runners.async_rl import AsyncRlEval
    from rlpyt_tpu.runners.sync import SyncRlEval
    from rlpyt_tpu.runners.train import MinibatchRlEval
    from rlpyt_tpu.samplers.rollout import BatchSpec

    def make(cls, **kw):
        agent = DqnAgent(ModelCls=DqnMlpModel,
                         model_kwargs=dict(hidden_sizes=(16,)),
                         eps_steps=500)
        algo = DQN(batch_size=32, min_steps_learn=64, replay_size=1_024,
                   replay_ratio=1.0, learning_rate=1e-3)
        return cls(algo=algo, agent=agent, env=CartPole(),
                   batch_spec=BatchSpec(T=8, B=8), n_steps=256,
                   seed=0, log_interval_steps=128,
                   max_decorrelation_steps=0, **kw)

    for cls in (MinibatchRlEval, SyncRlEval, AsyncRlEval):
        with pytest.raises(ValueError):
            make(cls)

    eval_kw = dict(eval_env=CartPole(), eval_n_envs=4,
                   eval_max_steps=32, eval_max_trajectories=2)
    carry = make(MinibatchRlEval, **eval_kw).train()
    assert int(carry.rollout_state.cum_steps) >= 256
    carry = make(AsyncRlEval, pipeline_depth=2, **eval_kw).train()
    assert int(carry.rollout_state.cum_steps) >= 256
    if len(jax.devices()) >= 2:
        carry = make(SyncRlEval, mesh=MeshSpec(dp=2), **eval_kw).train()
        assert int(carry.rollout_state.cum_steps) >= 256
