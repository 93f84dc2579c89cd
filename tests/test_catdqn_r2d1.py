"""C51 and R2D1 end-to-end tests on CartPole."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import pytest

from rlpyt_tpu.agents.dqn import CatDqnAgent, R2d1Agent
from rlpyt_tpu.algos.cat_dqn import CategoricalDQN
from rlpyt_tpu.algos.r2d1 import R2D1
from rlpyt_tpu.envs.classic import CartPole
from rlpyt_tpu.models.dqn import R2d1MlpModel
from rlpyt_tpu.models.mlp import MlpModel
from rlpyt_tpu.runners.train import MinibatchRl
from rlpyt_tpu.samplers.rollout import BatchSpec, Collector
from rlpyt_tpu.struct import infer_leading_dims, restore_leading_dims


class CartPoleCatModel(nn.Module):
    """MLP distributional Q for vector obs."""

    n_actions: int
    n_atoms: int = 51
    hidden_sizes: tuple = (128, 128)

    @nn.compact
    def __call__(self, observation, prev_action=None, prev_reward=None):
        lead_dim, T, B, obs_shape = infer_leading_dims(observation, 1)
        x = observation.reshape((T * B,) + obs_shape).astype(jnp.float32)
        x = MlpModel(self.hidden_sizes,
                     self.n_actions * self.n_atoms)(x)
        logits = x.reshape(T * B, self.n_actions, self.n_atoms)
        p = jax.nn.softmax(logits, axis=-1)
        return restore_leading_dims(p, lead_dim, T, B)


def eval_return(runner, carry, T=600, B=8):
    collector = Collector(runner.env, runner.agent, BatchSpec(T, B))
    state = collector.init_state(jax.random.key(99))
    state, _ = jax.jit(collector.collect, static_argnums=2)(
        carry.train_state.params, state, True)
    ts = state.traj_stats
    return float(ts.sum_return) / max(int(ts.completed), 1)


@pytest.mark.slow
def test_c51_learns_cartpole():
    agent = CatDqnAgent(ModelCls=CartPoleCatModel, n_atoms=51,
                        v_min=0.0, v_max=110.0, eps_steps=40_000,
                        eps_final=0.02)
    algo = CategoricalDQN(
        discount=0.99, batch_size=128, min_steps_learn=1_000,
        replay_size=50_000, replay_ratio=8.0, target_update_interval=300,
        learning_rate=5e-4, double_dqn=True, prioritized_replay=True)
    runner = MinibatchRl(
        algo=algo, agent=agent, env=CartPole(),
        batch_spec=BatchSpec(T=32, B=16), n_steps=80_000, seed=5,
        log_interval_steps=40_000)
    carry = runner.train()
    avg = eval_return(runner, carry)
    assert avg > 100, f"C51 failed on CartPole: {avg}"


@pytest.mark.slow
def test_r2d1_learns_cartpole():
    agent = R2d1Agent(ModelCls=R2d1MlpModel, lstm_size=64,
                      model_kwargs=dict(hidden_sizes=(64,)),
                      eps_steps=30_000, eps_final=0.02,
                      eps_final_min=None)
    algo = R2D1(
        discount=0.99, batch_b=32, batch_T=16, warmup_T=8,
        min_steps_learn=1_000, replay_size=50_000, replay_ratio=4.0,
        target_update_interval=150, n_step_return=3, learning_rate=1e-3,
        double_dqn=True, prioritized_replay=True)
    runner = MinibatchRl(
        algo=algo, agent=agent, env=CartPole(),
        batch_spec=BatchSpec(T=32, B=16), n_steps=100_000, seed=6,
        log_interval_steps=50_000)
    carry = runner.train()
    avg = eval_return(runner, carry)
    assert avg > 100, f"R2D1 failed on CartPole: {avg}"
