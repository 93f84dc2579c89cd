"""Host-env bridge: gymnasium adapter, shared-memory farm, host runner."""
import numpy as np
import pytest

from rlpyt_tpu.envs.gym_space import convert_gym_space
from rlpyt_tpu.envs.host import GymEnv, SerialVecEnv, SharedMemVecEnv
from rlpyt_tpu.spaces import Composite, FloatBox, IntBox


def test_space_conversion():
    import gymnasium.spaces as gs
    s = convert_gym_space(gs.Discrete(4))
    assert isinstance(s, IntBox) and s.n == 4
    s = convert_gym_space(gs.Box(low=-1.0, high=1.0, shape=(3,)))
    assert isinstance(s, FloatBox) and s.shape == (3,)
    s = convert_gym_space(gs.Dict({"a": gs.Discrete(2),
                                   "b": gs.Box(-1, 1, (2,))}))
    assert isinstance(s, Composite)


def test_gym_env_contract():
    env = GymEnv("CartPole-v1")
    obs = env.reset(seed=0)
    assert obs.shape == (4,)
    obs, rew, terminated, truncated = env.step(1)
    assert isinstance(rew, float) and isinstance(terminated, bool)
    env.close()


def _fns(n):
    return [lambda: GymEnv("CartPole-v1") for _ in range(n)]


def test_serial_vec_env():
    vec = SerialVecEnv(_fns(4), seed=0)
    obs = vec.reset()
    assert obs.shape == (4, 4)
    for _ in range(50):
        obs, rew, done, timeout = vec.step(np.ones(4, np.int32))
    assert rew.shape == (4,)
    vec.close()


def test_shared_mem_vec_env_matches_serial():
    """Fork-worker farm produces the same trajectories as serial
    (deterministic seeding; rlpyt's 'validated only by running them'
    gap, closed)."""
    serial = SerialVecEnv(_fns(4), seed=7)
    farm = SharedMemVecEnv(_fns(4), n_workers=2, seed=7)
    o1, o2 = serial.reset(), farm.reset()
    np.testing.assert_allclose(np.array(o1), np.array(o2), atol=1e-6)
    rng = np.random.RandomState(0)
    for i in range(100):
        a = rng.randint(0, 2, size=4).astype(np.int32)
        o1, r1, d1, t1 = serial.step(a)
        o2, r2, d2, t2 = farm.step(a)
        np.testing.assert_allclose(np.array(o1), np.array(o2), atol=1e-5,
                                   err_msg=f"step {i}")
        np.testing.assert_array_equal(np.array(d1), np.array(d2))
    serial.close()
    farm.close()


def test_timeout_flag():
    """TimeLimit truncation surfaces as timeout (not terminal death)."""
    vec = SerialVecEnv([lambda: GymEnv("CartPole-v1")], seed=1)
    vec.reset()
    # hold the pole poorly → terminations happen; eventually also test
    # that done==timeout only at the 500-step limit.  Use a faster route:
    # Pendulum has only time-limit ends.
    vec.close()
    vec = SerialVecEnv([lambda: GymEnv("Pendulum-v1")], seed=1)
    vec.reset()
    for i in range(200):
        obs, rew, done, timeout = vec.step(np.zeros((1, 1), np.float32))
        if done[0]:
            assert timeout[0]  # Pendulum only ends by TimeLimit
            break
    assert done[0] and i == 199  # 200-step limit
    vec.close()


@pytest.mark.slow
def test_host_dqn_learns_cartpole():
    from rlpyt_tpu.agents.dqn import DqnAgent
    from rlpyt_tpu.algos.dqn import DQN
    from rlpyt_tpu.models.dqn import DqnMlpModel
    from rlpyt_tpu.runners.host import HostMinibatchRl

    vec = SerialVecEnv(_fns(8), seed=3)
    agent = DqnAgent(ModelCls=DqnMlpModel,
                     model_kwargs=dict(hidden_sizes=(128, 128)),
                     eps_steps=20_000, eps_final=0.02)
    algo = DQN(batch_size=128, min_steps_learn=1_000, replay_size=50_000,
               replay_ratio=4.0, target_update_interval=300,
               learning_rate=1e-3, double_dqn=True)
    runner = HostMinibatchRl(algo=algo, agent=agent, vec_env=vec,
                             batch_T=32, n_steps=50_000, seed=3,
                             log_interval_steps=25_000)
    train_state, _ = runner.train()
    # learned: recent-window returns clearly above random (~22)
    vec2 = SerialVecEnv(_fns(8), seed=103)
    runner2 = HostMinibatchRl(algo=algo, agent=agent, vec_env=vec2,
                              batch_T=32, n_steps=1, seed=103)
    # quick greedy probe using the trained params through the step fn
    import jax
    import jax.numpy as jnp
    from rlpyt_tpu.agents.base import StepCtx
    obs = vec2.reset()
    rets = np.zeros(8)
    done_any = np.zeros(8, bool)
    prev_a = np.zeros(8, np.int32)
    prev_r = np.zeros(8, np.float32)
    for _ in range(300):
        q = agent.q(train_state.params, jnp.asarray(np.array(obs)),
                    jnp.asarray(prev_a), jnp.asarray(prev_r))
        a = np.asarray(jnp.argmax(q, axis=-1)).astype(np.int32)
        obs, rew, done, _ = vec2.step(a)
        rets += rew * (~done_any)
        done_any |= done
        if done_any.all():
            break
    vec.close()
    vec2.close()
    assert rets.mean() > 100, f"host DQN failed: {rets.mean()}"


def test_eval_does_not_perturb_training_stream():
    """Offline eval must not consume the actor's RNG stream: a host run
    with eval wired produces bitwise-identical training params to the
    same run without eval (regression: round-3's eval wiring initially
    split keys from _k_agent, silently changing every post-eval
    exploration draw)."""
    import jax
    import numpy as np

    from rlpyt_tpu.agents.dqn import DqnAgent
    from rlpyt_tpu.algos.dqn import DQN
    from rlpyt_tpu.envs.host import GymEnv, SerialVecEnv
    from rlpyt_tpu.models.dqn import DqnMlpModel
    from rlpyt_tpu.runners.host import HostMinibatchRl

    def run(with_eval):
        vec = SerialVecEnv([lambda: GymEnv("CartPole-v1")] * 4, seed=3)
        eval_vec = (SerialVecEnv([lambda: GymEnv("CartPole-v1")] * 2,
                                 seed=99) if with_eval else None)
        agent = DqnAgent(ModelCls=DqnMlpModel,
                         model_kwargs={"hidden_sizes": (32,)},
                         eps_steps=1_000)
        algo = DQN(batch_size=32, min_steps_learn=64, replay_size=2_048,
                   replay_ratio=1.0, learning_rate=1e-3)
        runner = HostMinibatchRl(algo=algo, agent=agent, vec_env=vec,
                                 batch_T=8, n_steps=512, seed=5,
                                 log_interval_steps=128,
                                 eval_vec_env=eval_vec,
                                 eval_max_steps=32,
                                 eval_max_trajectories=2)
        ts, _ = runner.train()
        vec.close()
        if eval_vec is not None:
            eval_vec.close()
        return ts.params

    p_no, p_yes = run(False), run(True)
    for a, b in zip(jax.tree_util.tree_leaves(p_no),
                    jax.tree_util.tree_leaves(p_yes)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
