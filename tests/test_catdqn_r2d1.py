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


def test_r2d1_mask_after_done_flag():
    """Default trains ALL window steps (the model resets the recurrence
    at in-window episode starts); mask_after_done=True restores rlpyt's
    after-first-done masking — the two must differ exactly on a batch
    whose training slice contains a done."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rlpyt_tpu.replay.sequence import SequenceSamples

    agent = R2d1Agent(ModelCls=R2d1MlpModel, lstm_size=8,
                      model_kwargs=dict(hidden_sizes=(8,)))
    env = CartPole()
    agent.initialize(env.spaces)
    params = agent.init(jax.random.key(0),
                        jnp.zeros((1, 4), jnp.float32))

    wT, T, n, b = 2, 6, 1, 3
    W = wT + T + n
    done = jnp.zeros((W, b), bool).at[wT + 2, 0].set(True)  # mid-slice
    batch = SequenceSamples(
        observation=jnp.ones((W, b, 4), jnp.float32),
        action=jnp.zeros((W, b), jnp.int32),
        reward=jnp.ones((W, b), jnp.float32),
        done=done,
        prev_action=jnp.zeros((W, b), jnp.int32),
        prev_reward=jnp.zeros((W, b), jnp.float32),
        init_rnn_state=(jnp.zeros((b, 8)), jnp.zeros((b, 8))),
        is_weights=jnp.ones((b,)),
        slots=(jnp.zeros((b,), jnp.int32), jnp.arange(b, dtype=jnp.int32)),
    )

    def loss_of(mask):
        algo = R2D1(batch_b=b, batch_T=T, warmup_T=wT, n_step_return=n,
                    mask_after_done=mask)
        algo.agent = agent
        return algo.loss(params, params, batch)

    (l_all, p_all) = loss_of(False)
    (l_masked, p_masked) = loss_of(True)
    assert np.isfinite(float(l_all)) and np.isfinite(float(l_masked))
    # masking removes post-done steps from both the loss and the
    # priority statistics of lane 0, so the outputs must differ
    assert not np.allclose(np.asarray(p_all), np.asarray(p_masked))
