"""A2C / PPO end-to-end learning tests on CartPole (feedforward and
recurrent paths)."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import pytest

from rlpyt_tpu.agents.pg import CategoricalPgAgent, RecurrentCategoricalPgAgent
from rlpyt_tpu.algos.pg import A2C, PPO
from rlpyt_tpu.envs.classic import CartPole
from rlpyt_tpu.models.mlp import MlpModel
from rlpyt_tpu.runners.train import MinibatchRl
from rlpyt_tpu.samplers.rollout import BatchSpec, Collector
from rlpyt_tpu.struct import infer_leading_dims, restore_leading_dims


class CartPoleFfModel(nn.Module):
    """Small MLP actor-critic for vector observations."""

    n_actions: int
    hidden_sizes: tuple = (64, 64)

    @nn.compact
    def __call__(self, observation, prev_action=None, prev_reward=None):
        lead_dim, T, B, obs_shape = infer_leading_dims(observation, 1)
        x = observation.reshape((T * B,) + obs_shape).astype(jnp.float32)
        x = MlpModel(self.hidden_sizes)(x)
        pi = nn.Dense(self.n_actions)(x)
        v = nn.Dense(1)(x)[..., 0]
        return restore_leading_dims((pi, v), lead_dim, T, B)


class CartPoleLstmModel(nn.Module):
    n_actions: int
    lstm_size: int = 64

    @nn.compact
    def __call__(self, observation, prev_action, prev_reward, rnn_state,
                 done=None):
        from rlpyt_tpu.models.rnn import LstmCore

        lead_dim, T, B, obs_shape = infer_leading_dims(observation, 1)
        x = observation.reshape(T, B, obs_shape[0]).astype(jnp.float32)
        x = MlpModel((64,))(x)
        pa = jax.nn.one_hot(prev_action.reshape(T, B), self.n_actions,
                            dtype=x.dtype)
        pr = prev_reward.reshape(T, B, 1).astype(x.dtype)
        inp = jnp.concatenate([x, pa, pr], axis=-1)
        done_tb = (jnp.zeros((T, B), jnp.bool_) if done is None
                   else done.reshape(T, B))
        y, next_state = LstmCore(self.lstm_size)(inp, done_tb, rnn_state)
        y = y.reshape(T * B, -1)
        pi = nn.Dense(self.n_actions)(y)
        v = nn.Dense(1)(y)[..., 0]
        pi, v = restore_leading_dims((pi, v), lead_dim, T, B)
        return pi, v, next_state


def eval_return(runner, carry, T=600, B=8):
    collector = Collector(runner.env, runner.agent, BatchSpec(T, B))
    state = collector.init_state(jax.random.key(99))
    state, _ = jax.jit(collector.collect, static_argnums=2)(
        carry.train_state.params, state, True)
    ts = state.traj_stats
    return float(ts.sum_return) / max(int(ts.completed), 1)


@pytest.mark.slow
def test_ppo_learns_cartpole():
    agent = CategoricalPgAgent(ModelCls=CartPoleFfModel)
    algo = PPO(discount=0.99, learning_rate=3e-4, epochs=4, minibatches=4,
               ratio_clip=0.2, gae_lambda=0.95, normalize_advantage=True,
               entropy_loss_coeff=0.0)
    runner = MinibatchRl(
        algo=algo, agent=agent, env=CartPole(),
        batch_spec=BatchSpec(T=128, B=16), n_steps=150_000, seed=2,
        log_interval_steps=50_000)
    carry = runner.train()
    avg = eval_return(runner, carry)
    assert avg > 150, f"PPO failed to learn CartPole: {avg}"


@pytest.mark.slow
def test_a2c_learns_cartpole():
    agent = CategoricalPgAgent(ModelCls=CartPoleFfModel)
    algo = A2C(discount=0.99, learning_rate=1e-3, gae_lambda=0.95,
               entropy_loss_coeff=0.01)
    runner = MinibatchRl(
        algo=algo, agent=agent, env=CartPole(),
        batch_spec=BatchSpec(T=32, B=32), n_steps=300_000, seed=3,
        log_interval_steps=100_000)
    carry = runner.train()
    avg = eval_return(runner, carry)
    assert avg > 120, f"A2C failed to learn CartPole: {avg}"


@pytest.mark.slow
def test_recurrent_ppo_runs_and_improves():
    agent = RecurrentCategoricalPgAgent(ModelCls=CartPoleLstmModel,
                                        lstm_size=64)
    algo = PPO(discount=0.99, learning_rate=5e-4, epochs=4, minibatches=4,
               ratio_clip=0.2, gae_lambda=0.95, normalize_advantage=True)
    runner = MinibatchRl(
        algo=algo, agent=agent, env=CartPole(),
        batch_spec=BatchSpec(T=64, B=16), n_steps=120_000, seed=4,
        log_interval_steps=60_000)
    carry = runner.train()
    avg = eval_return(runner, carry)
    assert avg > 80, f"Recurrent PPO too weak on CartPole: {avg}"
