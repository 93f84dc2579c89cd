"""End-to-end DQN learning smoke (SURVEY.md §4: CartPole-class env to
target return quickly on CPU) + rollout engine contract tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlpyt_tpu.agents.dqn import DqnAgent
from rlpyt_tpu.algos.dqn import DQN
from rlpyt_tpu.envs.classic import CartPole
from rlpyt_tpu.models.dqn import DqnMlpModel
from rlpyt_tpu.runners.train import MinibatchRl
from rlpyt_tpu.samplers.rollout import BatchSpec, Collector


def _make_runner(n_steps=80_000, prioritized=False, double=True, seed=0):
    env = CartPole()
    agent = DqnAgent(
        ModelCls=DqnMlpModel,
        model_kwargs=dict(hidden_sizes=(256, 256)),
        eps_steps=50_000,
        eps_final=0.02,
    )
    algo = DQN(
        discount=0.99,
        batch_size=128,
        min_steps_learn=1_000,
        replay_size=50_000,
        replay_ratio=8.0,
        target_update_interval=300,
        learning_rate=1e-3,
        double_dqn=double,
        prioritized_replay=prioritized,
    )
    return MinibatchRl(
        algo=algo, agent=agent, env=env,
        batch_spec=BatchSpec(T=32, B=16),
        n_steps=n_steps, seed=seed, log_interval_steps=20_000,
    )


@pytest.mark.slow
def test_dqn_learns_cartpole():
    runner = _make_runner()
    carry = runner.train()
    # Eval: near-greedy policy over a window long enough to finish
    # full-length episodes (CartPole horizon 500).
    collector = Collector(runner.env, runner.agent, BatchSpec(T=600, B=8))
    state = collector.init_state(jax.random.key(99))
    state, _ = jax.jit(collector.collect, static_argnums=2)(
        carry.train_state.params, state, True)
    stats = state.traj_stats
    avg = float(stats.sum_return) / max(int(stats.completed), 1)
    assert avg > 120, f"DQN failed to learn CartPole: avg return {avg}"


def test_rollout_shapes_and_stats():
    env = CartPole()
    agent = DqnAgent(ModelCls=DqnMlpModel,
                     model_kwargs=dict(hidden_sizes=(32,)))
    agent.initialize(env.spaces)
    spec = BatchSpec(T=20, B=4)
    collector = Collector(env, agent, spec)
    state = collector.init_state(jax.random.key(0))
    params = agent.init(jax.random.key(1), state.observation)
    state, samples = jax.jit(collector.collect)(params, state)
    assert samples.observation.shape == (20, 4, 4)
    assert samples.action.shape == (20, 4)
    assert samples.reward.shape == (20, 4)
    assert samples.done.shape == (20, 4)
    assert samples.agent_info["q"].shape == (20, 4, 2)
    assert int(state.cum_steps) == 80


def test_rollout_deterministic_under_fixed_seed():
    env = CartPole()
    agent = DqnAgent(ModelCls=DqnMlpModel,
                     model_kwargs=dict(hidden_sizes=(32,)))
    agent.initialize(env.spaces)
    spec = BatchSpec(T=50, B=8)
    collector = Collector(env, agent, spec)
    params = agent.init(jax.random.key(1),
                        collector.init_state(jax.random.key(0)).observation)

    def run():
        state = collector.init_state(jax.random.key(7))
        _, samples = jax.jit(collector.collect)(params, state)
        return samples

    s1, s2 = run(), run()
    np.testing.assert_array_equal(np.asarray(s1.observation),
                                  np.asarray(s2.observation))
    np.testing.assert_array_equal(np.asarray(s1.action),
                                  np.asarray(s2.action))


def test_rollout_autoreset_zeroes_prev():
    """After done, the next step's prev_action/prev_reward must be zero
    and the observation must come from a fresh reset (CpuResetCollector
    parity)."""
    env = CartPole(max_steps=10)  # force frequent dones
    agent = DqnAgent(ModelCls=DqnMlpModel,
                     model_kwargs=dict(hidden_sizes=(16,)))
    agent.initialize(env.spaces)
    spec = BatchSpec(T=40, B=2)
    collector = Collector(env, agent, spec)
    state = collector.init_state(jax.random.key(0))
    params = agent.init(jax.random.key(1), state.observation)
    state, samples = jax.jit(collector.collect)(params, state)
    done = np.asarray(samples.done)
    prev_r = np.asarray(samples.prev_reward)
    assert done.any()
    t_idx, b_idx = np.nonzero(done[:-1])
    # step after done: prev_reward is 0 (reset), even though reward was 1
    np.testing.assert_array_equal(prev_r[t_idx + 1, b_idx], 0.0)
    # CartPole obs after reset is within ±0.05
    obs_after = np.asarray(samples.observation)[t_idx + 1, b_idx]
    assert np.abs(obs_after).max() <= 0.05 + 1e-6


def test_traj_stats_window():
    env = CartPole(max_steps=10)
    agent = DqnAgent(ModelCls=DqnMlpModel,
                     model_kwargs=dict(hidden_sizes=(16,)))
    agent.initialize(env.spaces)
    collector = Collector(env, agent, BatchSpec(T=35, B=4))
    state = collector.init_state(jax.random.key(0))
    params = agent.init(jax.random.key(1), state.observation)
    state, samples = jax.jit(collector.collect)(params, state)
    n_done = int(np.asarray(samples.done).sum())
    assert int(state.traj_stats.completed) == n_done
    if n_done:
        assert float(state.traj_stats.sum_length) > 0
        # every completed CartPole(max 10) episode has length <= 10
        assert float(state.traj_stats.sum_length) <= 10 * n_done
