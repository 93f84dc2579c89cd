"""Alternating host sampler (reference: rlpyt samplers/parallel/gpu/
alternating_sampler.py:AlternatingSampler + AlternatingRecurrentAgentMixin):
env halves stepped out of phase, device inference of one half overlapping
env simulation of the other, with two recurrent carry banks."""
import jax.numpy as jnp
import numpy as np
import pytest

gym = pytest.importorskip("gymnasium")

from rlpyt_tpu.envs.host import PairedVecEnv, SerialVecEnv


def _paired(env_id, b_half, seed=0):
    return PairedVecEnv(SerialVecEnv([env_id] * b_half, seed=seed),
                        SerialVecEnv([env_id] * b_half, seed=seed + 100))


def test_paired_vec_env_lockstep_fallback():
    farm = _paired("CartPole-v1", 2)
    try:
        obs = farm.reset()
        assert obs.shape[0] == 4
        acts = np.zeros((4,), np.int64)
        obs, rew, done, to = farm.step(acts)
        assert obs.shape[0] == rew.shape[0] == done.shape[0] == 4
    finally:
        farm.close()


def test_alternating_collection_schema_and_learning():
    from rlpyt_tpu.agents.pg import GaussianPgAgent
    from rlpyt_tpu.algos.pg import PPO
    from rlpyt_tpu.runners.host import HostMinibatchRl

    farm = _paired("InvertedPendulum-v5", 2)
    try:
        agent = GaussianPgAgent(model_kwargs=dict(hidden_sizes=(32,)))
        algo = PPO(minibatches=2, epochs=1)
        runner = HostMinibatchRl(algo=algo, agent=agent, vec_env=farm,
                                 batch_T=16, n_steps=128, seed=0)
        train_state, _ = runner.startup()
        samples, rollout_state = runner._collect_batch(train_state.params)
        assert samples.observation.shape[:2] == (16, 4)
        assert samples.action.shape[:2] == (16, 4)
        di = samples.agent_info["dist_info"]
        mean = di.mean if hasattr(di, "mean") else di[0]
        assert mean.shape == (16, 4, 1)
        assert rollout_state.observation.shape[0] == 4
        # prev_reward must equal last reward where not done (per half)
        last_rew = np.asarray(samples.reward[-1])
        last_done = np.asarray(samples.done[-1])
        pr = np.asarray(rollout_state.prev_reward)
        np.testing.assert_allclose(pr[~last_done], last_rew[~last_done])
    finally:
        farm.close()


def test_alternating_recurrent_two_carry_banks():
    """Recurrent agent under alternation: separate per-half rnn state
    banks with per-env done reset (AlternatingRecurrentAgentMixin
    parity)."""
    from rlpyt_tpu.agents.pg import RecurrentGaussianPgAgent
    from rlpyt_tpu.algos.pg import PPO
    from rlpyt_tpu.runners.host import HostMinibatchRl

    farm = _paired("Pendulum-v1", 2)
    try:
        agent = RecurrentGaussianPgAgent(lstm_size=16,
                                         model_kwargs=dict(
                                             hidden_sizes=(32,)))
        algo = PPO(minibatches=2, epochs=1)
        runner = HostMinibatchRl(algo=algo, agent=agent, vec_env=farm,
                                 batch_T=8, n_steps=64, seed=0)
        train_state, replay_state = runner.startup()
        assert len(runner._alt_carry) == 2  # two banks
        samples, rollout_state = runner._collect_batch(train_state.params)
        # merged carry spans all 4 lanes
        import jax
        for leaf in jax.tree_util.tree_leaves(rollout_state.agent_carry):
            assert leaf.shape[0] == 4
        # a full optimize step runs on alternating-collected samples
        k = jax.random.key(1)
        ts2, rs2, opt_info = jax.jit(algo.optimize)(
            train_state, replay_state, samples, k, rollout_state)
        assert np.isfinite(float(np.mean(np.asarray(opt_info.loss))))
    finally:
        farm.close()


def test_alternating_env_info_schema_matches_serial():
    """Alternating collection must forward ALL farm info keys into
    Samples.env_info exactly like the non-alternating path — an ALE
    farm under PairedVecEnv must not lose game_score/traj_done
    (reference: rlpyt AlternatingSampler shares the Samples schema
    with every other sampler)."""
    import jax
    from rlpyt_tpu.agents.dqn import DqnAgent
    from rlpyt_tpu.algos.dqn import DQN
    from rlpyt_tpu.envs.atari import AtariEnv
    from rlpyt_tpu.envs.fake_ale import FakeALE
    from rlpyt_tpu.models.dqn import AtariDqnModel
    from rlpyt_tpu.runners.host import HostMinibatchRl

    def fake_env(seed=0):
        return lambda: AtariEnv(ale_factory=FakeALE, seed=seed,
                                max_start_noops=0,
                                repeat_action_probability=0.0)

    tiny_model = dict(channels=(8,), kernel_sizes=(8,), strides=(8,),
                      paddings=(0,), fc_sizes=(32,))

    def collect(vec):
        agent = DqnAgent(ModelCls=AtariDqnModel,
                         model_kwargs=tiny_model)
        algo = DQN(min_steps_learn=10_000, replay_size=4_096,
                   batch_size=32, frame_buffer=True)
        runner = HostMinibatchRl(algo=algo, agent=agent, vec_env=vec,
                                 batch_T=8, n_steps=32, seed=0)
        train_state, _ = runner.startup()
        samples, _ = runner._collect_batch(train_state.params)
        return samples

    serial_vec = SerialVecEnv([fake_env(b) for b in range(4)], seed=0)
    paired_vec = PairedVecEnv(
        SerialVecEnv([fake_env(b) for b in range(2)], seed=0),
        SerialVecEnv([fake_env(2 + b) for b in range(2)], seed=100))
    try:
        s_serial = collect(serial_vec)
        s_alt = collect(paired_vec)
        assert set(s_serial.env_info) == set(s_alt.env_info)
        assert {"timeout", "game_score", "traj_done"} <= set(
            s_alt.env_info)
        for k in s_serial.env_info:
            assert (s_alt.env_info[k].shape
                    == s_serial.env_info[k].shape), k
            assert (s_alt.env_info[k].dtype
                    == s_serial.env_info[k].dtype), k
    finally:
        serial_vec.close()
        paired_vec.close()


def test_alternating_trains_e2e():
    from rlpyt_tpu.experiments.scripts.mujoco_pg import build_and_train
    runner, (train_state, _) = build_and_train(
        "ppo", serial=True, alternating=True,
        config_overrides=dict(
            env=dict(id="InvertedPendulum-v5"),
            eval_env=dict(id="InvertedPendulum-v5"),
            runner=dict(n_steps=1024, log_interval_steps=1024),
            sampler=dict(batch_T=32, batch_B=4),
            algo=dict(minibatches=2, epochs=2)))
    assert runner._cum_steps >= 1024
