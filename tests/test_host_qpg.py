"""Continuous control over the host bridge (gymnasium MuJoCo path):
the BASELINE.json "Mujoco HalfCheetah/Walker2d SAC + TD3" configuration
surface."""
import numpy as np
import pytest

from rlpyt_tpu.envs.host import GymEnv, SerialVecEnv


def test_mujoco_env_available():
    env = GymEnv("HalfCheetah-v5")
    obs = env.reset(seed=0)
    assert obs.shape == (17,)
    obs, rew, terminated, truncated = env.step(
        np.zeros(env.action_space.shape, np.float32))
    assert np.isfinite(rew)
    env.close()


@pytest.mark.slow
def test_host_sac_learns_pendulum():
    from rlpyt_tpu.agents.qpg import SacAgent
    from rlpyt_tpu.algos.qpg import SAC
    from rlpyt_tpu.runners.host import HostMinibatchRl

    vec = SerialVecEnv(["Pendulum-v1"] * 8, seed=4)
    agent = SacAgent()
    algo = SAC(batch_size=128, min_steps_learn=1_000, replay_size=100_000,
               replay_ratio=32.0, learning_rate=3e-4,
               target_update_tau=0.005)
    runner = HostMinibatchRl(algo=algo, agent=agent, vec_env=vec,
                             batch_T=32, n_steps=40_000, seed=4,
                             log_interval_steps=20_000)
    train_state, _ = runner.train()
    vec.close()

    # greedy (mean-action) eval on fresh envs
    import jax
    import jax.numpy as jnp
    from rlpyt_tpu.agents.base import StepCtx
    ctx = StepCtx(cum_steps=jnp.zeros((), jnp.int32), is_eval=True)
    vec2 = SerialVecEnv(["Pendulum-v1"] * 4, seed=104)
    obs = vec2.reset()
    rets = np.zeros(4)
    for i in range(200):
        astep, _ = agent.step(train_state.params, jax.random.key(i),
                              jnp.asarray(np.array(obs)), None, None,
                              None, ctx)
        obs, rew, done, _ = vec2.step(np.asarray(astep.action))
        rets += rew
    vec2.close()
    avg = rets.mean()
    assert avg > -400, f"host SAC failed on Pendulum: {avg}"
