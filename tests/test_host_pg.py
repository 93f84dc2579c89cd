"""Host-bridge policy gradients: PPO/A2C on real MuJoCo via gymnasium
(reference: rlpyt/experiments/scripts/mujoco/pg/train/* — the Gaussian
actor-critic path over the CpuSampler/GpuSampler)."""
import jax
import jax.numpy as jnp
import pytest

gym = pytest.importorskip("gymnasium")
pytest.importorskip("mujoco")


def _overrides(batch_T, batch_B, n_steps, **algo):
    return dict(runner=dict(n_steps=n_steps, log_interval_steps=n_steps),
                sampler=dict(batch_T=batch_T, batch_B=batch_B),
                algo=algo)


def _assert_trained(runner, train_state, n_steps):
    assert runner._cum_steps >= n_steps
    for leaf in jax.tree_util.tree_leaves(train_state.params):
        assert jnp.isfinite(leaf).all()


def test_host_mujoco_ppo_runs():
    from rlpyt_tpu.experiments.scripts.mujoco_pg import build_and_train
    runner, (train_state, _) = build_and_train(
        "ppo", serial=True,
        config_overrides=_overrides(64, 4, 1024, minibatches=4, epochs=2))
    _assert_trained(runner, train_state, 1024)


def test_host_mujoco_a2c_runs():
    from rlpyt_tpu.experiments.scripts.mujoco_pg import build_and_train
    runner, (train_state, _) = build_and_train(
        "a2c", serial=True, config_overrides=_overrides(32, 4, 512))
    _assert_trained(runner, train_state, 512)


def test_gaussian_agent_info_pytree_survives_host_collection():
    """DistInfoStd nesting must survive host-side stacking (the [T,2,B,A]
    flattening bug): old log-probs from collection are what PPO's ratio
    uses, so structure loss is silent corruption."""
    from rlpyt_tpu.agents.pg import GaussianPgAgent
    from rlpyt_tpu.algos.pg import PPO
    from rlpyt_tpu.envs.host import SerialVecEnv
    from rlpyt_tpu.runners.host import HostMinibatchRl

    farm = SerialVecEnv(["Pendulum-v1"] * 2, seed=0)
    try:
        agent = GaussianPgAgent(model_kwargs=dict(hidden_sizes=(32,)))
        algo = PPO(minibatches=2, epochs=1)
        runner = HostMinibatchRl(algo=algo, agent=agent, vec_env=farm,
                                 batch_T=8, n_steps=16, seed=0)
        train_state, _ = runner.startup()
        samples, _ = runner._collect_batch(train_state.params)
        di = samples.agent_info["dist_info"]
        mean = di.mean if hasattr(di, "mean") else di[0]
        assert mean.shape == (8, 2, 1)  # [T, B, action] — no folded axis
        assert jnp.isfinite(mean).all()
    finally:
        farm.close()


def test_host_eval_collector_caps():
    """Host offline eval honors eval_max_steps / eval_max_trajectories
    (rlpyt BaseSampler eval caps) and logs Eval* keys."""
    from rlpyt_tpu.experiments.scripts.mujoco_pg import build_and_train
    runner, (train_state, _) = build_and_train(
        "ppo", serial=True,
        config_overrides=dict(
            env=dict(id="InvertedPendulum-v5"),
            eval_env=dict(id="InvertedPendulum-v5"),
            runner=dict(n_steps=256, log_interval_steps=256),
            sampler=dict(batch_T=32, batch_B=4, eval_n_envs=2,
                         eval_max_steps=400, eval_max_trajectories=6),
            algo=dict(minibatches=2, epochs=1)))
    eps = runner._evaluate(train_state.params)
    assert len(eps) >= 1
    # steps cap: 400 total / 2 envs = 200 per lane max
    assert max(x[1] for x in eps) <= 200
    rets = [x[0] for x in eps]
    assert all(r > 0 for r in rets)  # InvertedPendulum reward is +1/step
