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
