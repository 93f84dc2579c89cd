"""DQN learns MinAtar Breakout above the random baseline (Atari-class
flagship path: conv model + HBM replay + fused rollout/learn)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlpyt_tpu.agents.dqn import DqnAgent
from rlpyt_tpu.algos.dqn import DQN
from rlpyt_tpu.envs.minatar import Breakout
from rlpyt_tpu.models.dqn import AtariDqnModel
from rlpyt_tpu.runners.train import MinibatchRl
from rlpyt_tpu.samplers.rollout import BatchSpec, Collector


def minatar_model_kwargs():
    """MinAtar-scale conv net (16x3x3 conv + 128 fc — the published
    MinAtar baseline architecture)."""
    return dict(channels=(16,), kernel_sizes=(3,), strides=(1,),
                paddings=(0,), fc_sizes=(128,))


@pytest.mark.slow
def test_dqn_learns_minatar_breakout():
    env = Breakout()  # sticky actions on, as published
    agent = DqnAgent(ModelCls=AtariDqnModel,
                     model_kwargs=minatar_model_kwargs(),
                     eps_steps=100_000, eps_final=0.1)
    algo = DQN(discount=0.99, batch_size=128, min_steps_learn=2_000,
               replay_size=100_000, replay_ratio=4.0,
               target_update_interval=500, learning_rate=3e-4,
               double_dqn=True, prioritized_replay=False, n_step_return=3)
    runner = MinibatchRl(algo=algo, agent=agent, env=env,
                         batch_spec=BatchSpec(T=32, B=32),
                         n_steps=300_000, seed=4,
                         log_interval_steps=100_000)
    carry = runner.train()

    # Greedy eval: random policy scores ~0.5/episode on MinAtar breakout;
    # require clearly-above-random play.
    col = Collector(env, agent, BatchSpec(T=800, B=8))
    state = col.init_state(jax.random.key(123))
    state, _ = jax.jit(col.collect, static_argnums=2)(
        carry.train_state.params, state, True)
    ts = state.traj_stats
    avg = float(ts.sum_return) / max(int(ts.completed), 1)
    assert avg > 2.0, f"DQN failed on MinAtar breakout: eval return {avg}"


@pytest.mark.slow
def test_lstm_a2c_learns_minatar_breakout():
    """Recurrent PG on the MinAtar conv path (the lstm_a2c config
    family; curve artifact in curves/minatar_breakout_lstm_a2c):
    small-budget learning threshold above the ~0.5 random baseline."""
    from rlpyt_tpu.experiments.scripts.minatar_pg import build_and_train

    runner, carry = build_and_train(
        "lstm_a2c", seed=3,
        config_overrides={
            "runner": {"n_steps": 400_000, "log_interval_steps": 200_000},
            "sampler": {"batch_T": 16, "batch_B": 64, "eval_n_envs": 0,
                        "max_decorrelation_steps": 50}})
    ts = carry.rollout_state.traj_stats
    # online stats were reset at the last interval boundary; use a fresh
    # greedy eval rollout instead
    ev = Collector(runner.env, runner.agent, BatchSpec(600, 16),
                   discount=0.99)
    state = ev.init_state(jax.random.key(9))
    state, _ = ev.collect(carry.train_state.params, state, is_eval=True)
    s = state.traj_stats
    avg = float(s.sum_return) / max(1, int(s.completed))
    assert avg > 1.5, f"lstm_a2c failed to learn breakout: {avg}"
