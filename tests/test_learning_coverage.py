"""Learning-coverage at the edges (VERDICT round-1 item #9): the ernbw
(Rainbow-combo) and R2D1 config surfaces learn on MinAtar (not just
CartPole), and the mp>1 training program runs with genuinely sharded
params on the live carry."""
import jax
import numpy as np
import pytest

from rlpyt_tpu.envs.minatar import Breakout
from rlpyt_tpu.runners.train import MinibatchRl
from rlpyt_tpu.samplers.rollout import BatchSpec, Collector


def _eval_return(env, agent, params, T=800, B=8, seed=123):
    col = Collector(env, agent, BatchSpec(T=T, B=B))
    state = col.init_state(jax.random.key(seed))
    state, _ = jax.jit(col.collect, static_argnums=2)(params, state, True)
    ts = state.traj_stats
    return float(ts.sum_return) / max(int(ts.completed), 1)


@pytest.mark.slow
def test_ernbw_learns_minatar_breakout():
    """The Rainbow-combo path (C51 + Double + Dueling + PER + n-step)
    learns MinAtar Breakout above random (~0.5/episode)."""
    from rlpyt_tpu.agents.dqn import CatDqnAgent
    from rlpyt_tpu.algos.cat_dqn import CategoricalDQN
    from rlpyt_tpu.models.dqn import AtariCatDqnModel

    env = Breakout()
    agent = CatDqnAgent(
        ModelCls=AtariCatDqnModel, n_atoms=51, v_min=-10.0, v_max=10.0,
        model_kwargs=dict(channels=(16,), kernel_sizes=(3,), strides=(1,),
                          paddings=(0,), fc_sizes=(128,), n_atoms=51,
                          dueling=True),
        eps_steps=100_000, eps_final=0.1)
    algo = CategoricalDQN(
        discount=0.99, batch_size=128, min_steps_learn=2_000,
        replay_size=100_000, replay_ratio=4.0,
        target_update_interval=500, learning_rate=3e-4,
        double_dqn=True, prioritized_replay=True, pri_alpha=0.5,
        pri_beta=0.4, n_step_return=3)
    runner = MinibatchRl(algo=algo, agent=agent, env=env,
                         batch_spec=BatchSpec(T=32, B=32),
                         n_steps=500_000, seed=5,
                         log_interval_steps=100_000)
    carry = runner.train()
    avg = _eval_return(env, agent, carry.train_state.params)
    # random ~0.5/episode; measured 1.6-2.0 at this budget across seeds
    assert avg > 1.5, f"ernbw eval return {avg}"


@pytest.mark.slow
def test_r2d1_learns_minatar_breakout():
    """R2D1 (recurrent sequence-PER with burn-in + value rescale) learns
    MinAtar Breakout above random."""
    from rlpyt_tpu.agents.dqn import R2d1Agent
    from rlpyt_tpu.algos.r2d1 import R2D1
    from rlpyt_tpu.models.dqn import AtariR2d1Model

    env = Breakout()
    agent = R2d1Agent(
        ModelCls=AtariR2d1Model,
        model_kwargs=dict(channels=(16,), kernel_sizes=(3,), strides=(1,),
                          paddings=(0,), lstm_size=128),
        lstm_size=128, eps_steps=100_000, eps_final=0.1)
    algo = R2D1(discount=0.99, batch_b=32, batch_T=20, warmup_T=10,
                min_steps_learn=2_000, replay_size=100_000,
                replay_ratio=1.0, target_update_interval=500,
                n_step_return=3, learning_rate=3e-4, double_dqn=True,
                prioritized_replay=True, pri_alpha=0.6, pri_beta=0.9)
    runner = MinibatchRl(algo=algo, agent=agent, env=env,
                         batch_spec=BatchSpec(T=40, B=32),
                         n_steps=300_000, seed=6,
                         log_interval_steps=100_000)
    carry = runner.train()
    avg = _eval_return(env, agent, carry.train_state.params)
    assert avg > 1.5, f"r2d1 eval return {avg}"


def test_syncrl_mp_sharding_is_live():
    """The mp-axis training program runs with genuinely sharded params:
    a layer above shard_params' min_size (256x512 kernel = 131k params
    >= 1<<16) is 'mp'-sharded ON THE LIVE CARRY after training (not
    re-derived post-hoc), and the result matches single-device numerics."""
    from rlpyt_tpu.agents.dqn import DqnAgent
    from rlpyt_tpu.algos.dqn import DQN
    from rlpyt_tpu.envs.classic import CartPole
    from rlpyt_tpu.models.dqn import DqnMlpModel
    from rlpyt_tpu.parallel.mesh import MeshSpec
    from rlpyt_tpu.runners.sync import SyncRl

    def make():
        agent = DqnAgent(ModelCls=DqnMlpModel,
                         model_kwargs={"hidden_sizes": (256, 512)},
                         eps_steps=2_000)
        algo = DQN(batch_size=64, min_steps_learn=256, replay_size=8_192,
                   replay_ratio=1.0, learning_rate=1e-3)
        return agent, algo

    agent, algo = make()
    runner = SyncRl(algo=algo, agent=agent, env=CartPole(),
                    batch_spec=BatchSpec(T=16, B=16), n_steps=2_048,
                    seed=3, log_interval_steps=1_024,
                    max_decorrelation_steps=0,
                    mesh=MeshSpec(dp=4, mp=2))
    carry = runner.train()
    specs = [str(leaf.sharding.spec)
             for leaf in jax.tree.leaves(carry.train_state.params)]
    assert any("mp" in s for s in specs), f"no live mp sharding: {specs}"
    assert int(carry.rollout_state.cum_steps) >= 2_048

    agent2, algo2 = make()
    single = MinibatchRl(algo=algo2, agent=agent2, env=CartPole(),
                         batch_spec=BatchSpec(T=16, B=16), n_steps=2_048,
                         seed=3, log_interval_steps=1_024,
                         max_decorrelation_steps=0)
    c2 = single.train()
    for a, b in zip(jax.tree.leaves(carry.train_state.params),
                    jax.tree.leaves(c2.train_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)
