"""DDPG / TD3 / SAC end-to-end on Pendulum (continuous-control smoke,
standing in for the reference's HalfCheetah configs at test scale).

Pendulum's return range is about [-1700, 0]; an untrained policy sits near
-1200..-1500 and a trained one above -300.
"""
import jax
import pytest

from rlpyt_tpu.agents.qpg import DdpgAgent, SacAgent, Td3Agent
from rlpyt_tpu.algos.qpg import DDPG, SAC, TD3
from rlpyt_tpu.envs.classic import Pendulum
from rlpyt_tpu.runners.train import MinibatchRl
from rlpyt_tpu.samplers.rollout import BatchSpec, Collector


def eval_return(runner, carry, T=220, B=16):
    collector = Collector(runner.env, runner.agent, BatchSpec(T, B))
    state = collector.init_state(jax.random.key(99))
    state, _ = jax.jit(collector.collect, static_argnums=2)(
        carry.train_state.params, state, True)
    ts = state.traj_stats
    return float(ts.sum_return) / max(int(ts.completed), 1)


def run(agent, algo, n_steps=40_000, seed=0):
    runner = MinibatchRl(
        algo=algo, agent=agent, env=Pendulum(),
        batch_spec=BatchSpec(T=32, B=8), n_steps=n_steps, seed=seed,
        log_interval_steps=20_000, max_decorrelation_steps=50)
    carry = runner.train()
    return eval_return(runner, carry)


@pytest.mark.slow
def test_sac_learns_pendulum():
    agent = SacAgent(model_kwargs=dict(hidden_sizes=(128, 128)),
                     q_model_kwargs=dict(hidden_sizes=(128, 128)))
    algo = SAC(batch_size=128, replay_ratio=32.0, min_steps_learn=1_000,
               replay_size=100_000, learning_rate=1e-3)
    avg = run(agent, algo, seed=0)
    assert avg > -400, f"SAC failed on Pendulum: {avg}"


@pytest.mark.slow
def test_td3_learns_pendulum():
    agent = Td3Agent(model_kwargs=dict(hidden_sizes=(128, 128)),
                     q_model_kwargs=dict(hidden_sizes=(128, 128)),
                     initial_std=0.2)
    algo = TD3(batch_size=128, replay_ratio=32.0, min_steps_learn=1_000,
               replay_size=100_000, learning_rate=1e-3,
               q_learning_rate=1e-3)
    avg = run(agent, algo, seed=1)
    assert avg > -500, f"TD3 failed on Pendulum: {avg}"


@pytest.mark.slow
def test_ddpg_learns_pendulum():
    agent = DdpgAgent(model_kwargs=dict(hidden_sizes=(128, 128)),
                      q_model_kwargs=dict(hidden_sizes=(128, 128)),
                      initial_std=0.2)
    algo = DDPG(batch_size=128, replay_ratio=32.0, min_steps_learn=1_000,
                replay_size=100_000, learning_rate=1e-3,
                q_learning_rate=1e-3)
    avg = run(agent, algo, seed=2)
    assert avg > -600, f"DDPG failed on Pendulum: {avg}"


@pytest.mark.slow
def test_sac_learns_reacher():
    """On-device continuous control on the 2-link arm: untrained policy
    sits near -10 per 50-step episode; a reaching policy lands near -6
    (travel time bounds the best achievable return around -4.5)."""
    from rlpyt_tpu.envs.reacher import Reacher

    agent = SacAgent(model_kwargs=dict(hidden_sizes=(128, 128)),
                     q_model_kwargs=dict(hidden_sizes=(128, 128)))
    algo = SAC(batch_size=128, replay_ratio=16.0, min_steps_learn=1_000,
               replay_size=100_000, learning_rate=1e-3)
    runner = MinibatchRl(
        algo=algo, agent=agent, env=Reacher(),
        batch_spec=BatchSpec(T=32, B=8), n_steps=100_000, seed=0,
        log_interval_steps=50_000, max_decorrelation_steps=50)
    carry = runner.train()
    runner_env = runner.env
    collector = Collector(runner_env, runner.agent, BatchSpec(50, 32))
    state = collector.init_state(jax.random.key(99))
    state, _ = jax.jit(collector.collect, static_argnums=2)(
        carry.train_state.params, state, True)
    ts = state.traj_stats
    avg = float(ts.sum_return) / max(int(ts.completed), 1)
    assert avg > -7.5, f"SAC failed on Reacher: {avg}"
