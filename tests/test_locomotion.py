"""On-device planar locomotion (SURVEY §2.12 mujoco→on-device physics
row; VERDICT round-1 item #8: a locomotion-class task with contact and
multi-joint dynamics that a QPG algo learns fully on-device)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlpyt_tpu.envs.locomotion import Cheetah2D, Hopper2D, _contact_points


def _rollout(env, key, n, policy=None):
    s, obs = env.reset(key)

    def body(s, k):
        a = (jax.random.uniform(k, (env.na,), minval=-1, maxval=1)
             if policy is None else policy)
        s2, step = env.step(k, s, a)
        return s2, (step.reward, step.done, s2.q)

    ks = jax.random.split(key, n)
    return jax.lax.scan(body, s, ks)[1]


@pytest.mark.parametrize("EnvCls", [Hopper2D, Cheetah2D])
def test_physics_stable_and_finite(EnvCls):
    """Random torques for 300 control steps (4800 substeps): state stays
    finite and bounded — the contact integrator is inside its stability
    region."""
    env = EnvCls()
    rews, dones, qs = jax.jit(lambda k: _rollout(env, k, 300))(
        jax.random.key(1))
    assert bool(jnp.all(jnp.isfinite(qs)))
    assert float(jnp.abs(qs).max()) < 100.0
    assert bool(jnp.all(jnp.isfinite(rews)))


def test_contact_holds_foot_above_ground():
    """The spring contact keeps penetration small: while the hopper is
    healthy, its foot contact points never sink materially below the
    ground plane."""
    env = Hopper2D()
    rews, dones, qs = jax.jit(lambda k: _rollout(env, k, 200))(
        jax.random.key(2))
    alive = ~jnp.cumsum(dones).astype(bool)
    pts = jax.vmap(lambda q: _contact_points(env.spec, q))(qs)  # [T,c,2]
    foot_z = pts[:, :2, 1]  # heel, toe
    assert float(jnp.where(alive[:, None], foot_z, 0.0).min()) > -0.08


def test_vmapped_lanes_deterministic():
    env = Hopper2D()
    f = jax.jit(jax.vmap(lambda k: _rollout(env, k, 50)[2][-1]))
    ks = jax.random.split(jax.random.key(3), 32)
    np.testing.assert_array_equal(np.asarray(f(ks)), np.asarray(f(ks)))


@pytest.mark.slow
def test_sac_learns_hopper_on_device():
    """SAC trains Hopper2D entirely on-device (rollout scan + replay +
    updates in one jitted program).  Random-policy ReturnAverage is ~9;
    the run must exceed 35 (measured: ~45-60 at this budget)."""
    from rlpyt_tpu.agents.qpg import SacAgent
    from rlpyt_tpu.algos.qpg import SAC
    from rlpyt_tpu.runners.train import MinibatchRl
    from rlpyt_tpu.samplers.rollout import BatchSpec

    agent = SacAgent()
    algo = SAC(batch_size=256, min_steps_learn=2_000, replay_size=200_000,
               replay_ratio=64.0, learning_rate=3e-4,
               target_update_tau=0.005)
    runner = MinibatchRl(algo=algo, agent=agent, env=Hopper2D(),
                         batch_spec=BatchSpec(32, 32), n_steps=120_000,
                         log_interval_steps=20_000, seed=0)
    averages = []
    orig = runner.logger.record_tabular

    def spy(key, value):
        if key == "ReturnAverage":
            averages.append(float(value))
        orig(key, value)

    runner.logger.record_tabular = spy
    runner.train()
    assert averages and max(averages[-2:]) > 35.0, f"returns {averages}"
