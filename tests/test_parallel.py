"""Data-parallel mesh runner tests on the 8-device virtual CPU mesh
(SURVEY.md §4: test pjit/shard_map topologies without TPU hardware)."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlpyt_tpu.agents.dqn import DqnAgent
from rlpyt_tpu.agents.pg import CategoricalPgAgent
from rlpyt_tpu.algos.dqn import DQN
from rlpyt_tpu.algos.pg import A2C
from rlpyt_tpu.envs.classic import CartPole
from rlpyt_tpu.models.dqn import DqnMlpModel
from rlpyt_tpu.models.mlp import MlpModel
from rlpyt_tpu.parallel.mesh import MeshSpec, make_mesh, shard_params
from rlpyt_tpu.struct import infer_leading_dims, restore_leading_dims


class PgFfModel(nn.Module):
    n_actions: int
    hidden_sizes: tuple = (32, 32)

    @nn.compact
    def __call__(self, observation, prev_action=None, prev_reward=None):
        lead_dim, T, B, obs_shape = infer_leading_dims(observation, 1)
        x = observation.reshape((T * B,) + obs_shape).astype(jnp.float32)
        x = MlpModel(self.hidden_sizes)(x)
        pi = nn.Dense(self.n_actions)(x)
        v = nn.Dense(1)(x)[..., 0]
        return restore_leading_dims((pi, v), lead_dim, T, B)
from rlpyt_tpu.runners.sync import SyncRl
from rlpyt_tpu.runners.train import MinibatchRl
from rlpyt_tpu.samplers.rollout import BatchSpec


def make_dqn(B=16):
    agent = DqnAgent(ModelCls=DqnMlpModel,
                     model_kwargs=dict(hidden_sizes=(64, 64)),
                     eps_steps=5_000, eps_final=0.1)
    algo = DQN(batch_size=64, min_steps_learn=256, replay_size=8_192,
               replay_ratio=4.0, target_update_interval=50,
               learning_rate=1e-3)
    return agent, algo


def test_mesh_spec():
    mesh = make_mesh(dp=4, mp=2)
    assert mesh.shape == {"dp": 4, "mp": 2}
    mesh = make_mesh()  # all devices on dp
    assert mesh.shape["dp"] == len(jax.devices())


def test_syncrl_dqn_runs_sharded():
    agent, algo = make_dqn()
    runner = SyncRl(algo=algo, agent=agent, env=CartPole(),
                    batch_spec=BatchSpec(T=16, B=16), n_steps=4_096,
                    seed=0, log_interval_steps=2_048,
                    max_decorrelation_steps=20, mesh=MeshSpec(dp=8))
    carry = runner.train()
    # env lanes sharded over dp
    obs_shard = carry.rollout_state.observation.sharding
    assert "dp" in str(obs_shard.spec)
    # replay ring sharded on its lane axis
    ring_shard = carry.replay_state.data.reward.sharding
    assert ring_shard.spec[1] == "dp"
    # params replicated
    leaf = jax.tree.leaves(carry.train_state.params)[0]
    assert leaf.sharding.is_fully_replicated
    assert int(carry.rollout_state.cum_steps) >= 4_096


def test_syncrl_matches_single_device_math():
    """Same program, different layout ⇒ near-identical numerics."""
    def run(runner_cls, **kw):
        agent, algo = make_dqn()
        runner = runner_cls(algo=algo, agent=agent, env=CartPole(),
                            batch_spec=BatchSpec(T=16, B=16),
                            n_steps=2_048, seed=3, log_interval_steps=1_024,
                            max_decorrelation_steps=0, **kw)
        return runner.train()

    c1 = run(MinibatchRl)
    c2 = run(SyncRl, mesh=MeshSpec(dp=8))
    p1 = jax.tree.leaves(c1.train_state.params)
    p2 = jax.tree.leaves(c2.train_state.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_syncrl_a2c_runs():
    agent = CategoricalPgAgent(ModelCls=PgFfModel)
    algo = A2C(learning_rate=1e-3, discount=0.99)
    runner = SyncRl(algo=algo, agent=agent, env=CartPole(),
                    batch_spec=BatchSpec(T=16, B=16), n_steps=2_048,
                    seed=1, log_interval_steps=1_024,
                    max_decorrelation_steps=0, mesh=MeshSpec(dp=4))
    carry = runner.train()
    assert int(carry.rollout_state.cum_steps) >= 2_048


def test_tensor_parallel_params():
    """mp axis column-shards large kernels; program still runs."""
    mesh = make_mesh(dp=4, mp=2)
    agent, algo = make_dqn()
    runner = SyncRl(algo=algo, agent=agent, env=CartPole(),
                    batch_spec=BatchSpec(T=16, B=16), n_steps=1_024,
                    seed=2, log_interval_steps=1_024,
                    max_decorrelation_steps=0, mesh=mesh)
    carry = runner.train()
    shardings = shard_params(carry.train_state.params, mesh, min_size=1)
    specs = [s.spec for s in jax.tree.leaves(shardings)]
    assert any("mp" in str(s) for s in specs)


def test_tensor_parallel_live_training():
    """The *training program itself* runs with mp-sharded params: a
    512x512 kernel (262144 params >= shard_params' 1<<16 threshold) is
    column-sharded on the live carry during train(), and the result
    still matches the single-device program (VERDICT r1 weak #8)."""
    def make():
        agent = DqnAgent(ModelCls=DqnMlpModel,
                         model_kwargs=dict(hidden_sizes=(512, 512)),
                         eps_steps=5_000, eps_final=0.1)
        algo = DQN(batch_size=64, min_steps_learn=256, replay_size=8_192,
                   replay_ratio=4.0, target_update_interval=50,
                   learning_rate=1e-3)
        return agent, algo

    def run(runner_cls, **kw):
        agent, algo = make()
        runner = runner_cls(algo=algo, agent=agent, env=CartPole(),
                            batch_spec=BatchSpec(T=16, B=16),
                            n_steps=1_024, seed=5, log_interval_steps=512,
                            max_decorrelation_steps=0, **kw)
        return runner.train()

    carry = run(SyncRl, mesh=make_mesh(dp=4, mp=2))
    # live params (post-training) really carry an mp-sharded spec
    specs = [leaf.sharding.spec for leaf
             in jax.tree.leaves(carry.train_state.params)]
    assert any("mp" in str(s) for s in specs), specs
    big = [leaf for leaf in jax.tree.leaves(carry.train_state.params)
           if leaf.size >= (1 << 16)]
    assert big and all("mp" in str(leaf.sharding.spec) for leaf in big)

    ref = run(MinibatchRl)
    for a, b in zip(jax.tree.leaves(ref.train_state.params),
                    jax.tree.leaves(carry.train_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)
