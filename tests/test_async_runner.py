"""Async (pipelined) runner: decoupled update rate + overlap correctness."""
import jax
import numpy as np

from rlpyt_tpu.agents.dqn import DqnAgent
from rlpyt_tpu.algos.dqn import DQN
from rlpyt_tpu.envs.classic import CartPole
from rlpyt_tpu.models.dqn import DqnMlpModel
from rlpyt_tpu.runners.async_rl import AsyncRl
from rlpyt_tpu.runners.train import MinibatchRl
from rlpyt_tpu.samplers.rollout import BatchSpec


def make(runner_cls, **kw):
    agent = DqnAgent(ModelCls=DqnMlpModel,
                     model_kwargs=dict(hidden_sizes=(32,)),
                     eps_steps=2_000)
    algo = DQN(batch_size=32, min_steps_learn=128, replay_size=4_096,
               replay_ratio=1.0, target_update_interval=50,
               learning_rate=1e-3)
    return runner_cls(algo=algo, agent=agent, env=CartPole(),
                      batch_spec=BatchSpec(T=16, B=8), n_steps=2_048,
                      seed=2, log_interval_steps=512,
                      max_decorrelation_steps=0, **kw)


def test_async_matches_sync_math():
    """Pipelining changes scheduling, not semantics."""
    c1 = make(MinibatchRl).train()
    c2 = make(AsyncRl, pipeline_depth=2).train()
    for a, b in zip(jax.tree.leaves(c1.train_state.params),
                    jax.tree.leaves(c2.train_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_update_throttle():
    """updates_per_interval overrides the replay-ratio arithmetic."""
    runner = make(AsyncRl, updates_per_interval=64)
    carry = runner.train()
    # 64 updates/interval over 4 intervals, min_steps_learn gates the first
    # itrs; counter reflects the explicit throttle (64/itrs_per_interval
    # per itr, itrs with cum_steps >= min_steps_learn)
    assert runner.algo.updates_per_optimize == 64 // runner.itrs_per_interval
    assert int(carry.train_state.update_counter) > 0
