"""Env determinism + contract tests (the fixed-seed exact-trajectory
requirement from BASELINE.md)."""
import jax
import jax.numpy as jnp
import numpy as np

from rlpyt_tpu.envs.classic import CartPole, MountainCar, Pendulum


def rollout(env, seed, n=50):
    key = jax.random.key(seed)
    k_reset, key = jax.random.split(key)
    state, obs = env.reset(k_reset)
    traj = [obs]
    for i in range(n):
        key, k_act, k_step = jax.random.split(key, 3)
        action = env.action_space.sample(k_act)
        state, step = env.step(k_step, state, action)
        traj.append(step.observation)
    return np.stack([np.asarray(o) for o in traj])


def test_fixed_seed_exact_trajectory():
    for env in (CartPole(), Pendulum(), MountainCar()):
        t1 = rollout(env, 123)
        t2 = rollout(env, 123)
        np.testing.assert_array_equal(t1, t2)
        t3 = rollout(env, 124)
        assert not np.array_equal(t1, t3)


def test_env_step_contract():
    for env in (CartPole(), Pendulum(), MountainCar()):
        key = jax.random.key(0)
        state, obs = env.reset(key)
        assert obs.shape == env.observation_space.shape
        action = env.action_space.sample(key)
        state, step = env.step(key, state, action)
        assert step.observation.shape == env.observation_space.shape
        assert step.reward.shape == ()
        assert step.done.dtype == jnp.bool_
        assert set(step.info) == set(env.example_info())


def test_time_limit_truncation():
    env = CartPole(max_steps=10)
    key = jax.random.key(0)
    state, obs = env.reset(key)
    # hold the pole: alternate actions to stay alive 10 steps
    for i in range(10):
        state, step = env.step(key, state, jnp.int32(i % 2))
        if bool(step.done):
            break
    # either fell over (terminated, no timeout) or hit the limit (timeout)
    if int(state.t) >= 10:
        assert bool(step.info["timeout"])


def test_vmapped_batch_step():
    env = CartPole()
    key = jax.random.key(0)
    state, obs = env.reset_batch(key, 16)
    assert obs.shape == (16, 4)
    actions = jnp.zeros(16, jnp.int32)
    state, step = env.step_batch(key, state, actions)
    assert step.observation.shape == (16, 4)
    assert step.done.shape == (16,)
    # batched trajectories must differ across envs (different reset keys)
    assert float(jnp.std(obs[:, 0])) > 0


# ---------------------------------------------------------------------------
# New classic envs: Acrobot / ContinuousMountainCar / Reacher
# ---------------------------------------------------------------------------

def test_new_envs_contract_and_determinism():
    from rlpyt_tpu.envs.classic import Acrobot, ContinuousMountainCar
    from rlpyt_tpu.envs.reacher import Reacher
    for env in (Acrobot(), ContinuousMountainCar(), Reacher()):
        key = jax.random.key(0)
        state, obs = env.reset(key)
        assert obs.shape == env.observation_space.shape
        action = env.action_space.sample(key)
        state, step = env.step(key, state, action)
        assert step.observation.shape == env.observation_space.shape
        assert step.reward.shape == ()
        assert step.done.dtype == jnp.bool_
        assert set(step.info) == set(env.example_info())
        t1 = rollout(env, 7, n=20)
        t2 = rollout(env, 7, n=20)
        np.testing.assert_array_equal(t1, t2)


def test_acrobot_matches_gymnasium_dynamics():
    """Exact-dynamics parity with gymnasium Acrobot-v1 from identical
    states (single RK4 step, book formulation)."""
    import gymnasium as gym

    from rlpyt_tpu.envs.classic import Acrobot, AcrobotState

    ref = gym.make("Acrobot-v1").unwrapped
    ref.reset(seed=0)
    ours = Acrobot()
    rng = np.random.default_rng(3)
    for _ in range(10):
        s = rng.uniform(-1.0, 1.0, 4) * np.array([np.pi, np.pi, 2.0, 2.0])
        a = int(rng.integers(0, 3))
        ref.state = s.copy()
        ref_obs, ref_rew, ref_term, _, _ = ref.step(a)
        st = AcrobotState(*[jnp.float32(v) for v in s],
                          jnp.zeros((), jnp.int32))
        _, step = ours.step(jax.random.key(0), st, jnp.int32(a))
        np.testing.assert_allclose(np.asarray(step.observation), ref_obs,
                                   atol=2e-4)
        assert float(step.reward) == ref_rew
        assert bool(step.done) == bool(ref_term)


def test_continuous_mountain_car_matches_gymnasium():
    import gymnasium as gym

    from rlpyt_tpu.envs.classic import ContinuousMountainCar, MountainCarState

    ref = gym.make("MountainCarContinuous-v0").unwrapped
    ref.reset(seed=0)
    ours = ContinuousMountainCar()
    rng = np.random.default_rng(5)
    for _ in range(10):
        pos = float(rng.uniform(-1.1, 0.4))
        vel = float(rng.uniform(-0.06, 0.06))
        a = np.asarray([float(rng.uniform(-1, 1))], np.float32)
        ref.state = np.array([pos, vel])
        ref_obs, ref_rew, ref_term, _, _ = ref.step(a)
        st = MountainCarState(jnp.float32(pos), jnp.float32(vel),
                              jnp.zeros((), jnp.int32))
        _, step = ours.step(jax.random.key(0), st, jnp.asarray(a))
        np.testing.assert_allclose(np.asarray(step.observation), ref_obs,
                                   atol=1e-5)
        np.testing.assert_allclose(float(step.reward), ref_rew, atol=1e-5)
        assert bool(step.done) == bool(ref_term)


def test_reacher_physics_sane():
    from rlpyt_tpu.envs.reacher import Reacher

    env = Reacher()
    key = jax.random.key(1)
    state, obs = env.reset(key)
    # fingertip-delta obs slot agrees with the kinematics
    tip = env._fingertip(state.q)
    np.testing.assert_allclose(np.asarray(obs[8:10]),
                               np.asarray(tip - state.target), atol=1e-6)
    # zero torque + damping: arm stays bounded, no NaNs over an episode
    for _ in range(50):
        state, step = env.step(key, state, jnp.zeros(2))
    assert np.all(np.isfinite(np.asarray(step.observation)))
    assert float(jnp.max(jnp.abs(state.qd))) < env.max_vel
    # reward decreases with distance: pulling fingertip to the target helps
    from rlpyt_tpu.envs.reacher import ReacherState
    at_target = ReacherState(state.q, jnp.zeros(2),
                             env._fingertip(state.q),
                             jnp.zeros((), jnp.int32))
    _, step_close = env.step(key, at_target, jnp.zeros(2))
    far = ReacherState(state.q, jnp.zeros(2),
                       -env._fingertip(state.q) + 0.3,
                       jnp.zeros((), jnp.int32))
    _, step_far = env.step(key, far, jnp.zeros(2))
    assert float(step_close.reward) > float(step_far.reward)
