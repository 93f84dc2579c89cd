"""Spawn-mode farm: string env specs, safe after JAX init."""
import numpy as np

from rlpyt_tpu.envs.host import SerialVecEnv, SharedMemVecEnv


def test_spawn_farm_matches_serial():
    import jax
    import jax.numpy as jnp
    _ = jnp.zeros(3) + 1  # force JAX init BEFORE the farm (the hazard)

    serial = SerialVecEnv(["CartPole-v1"] * 4, seed=11)
    farm = SharedMemVecEnv(["CartPole-v1"] * 4, n_workers=2, seed=11)
    assert farm._procs[0]._start_method if hasattr(
        farm._procs[0], "_start_method") else True
    o1, o2 = serial.reset(), farm.reset()
    np.testing.assert_allclose(np.array(o1), np.array(o2), atol=1e-6)
    rng = np.random.RandomState(5)
    for _ in range(60):
        a = rng.randint(0, 2, size=4).astype(np.int32)
        o1, r1, d1, t1 = serial.step(a)
        o2, r2, d2, t2 = farm.step(a)
        np.testing.assert_allclose(np.array(o1), np.array(o2), atol=1e-5)
        np.testing.assert_array_equal(d1, d2)
    serial.close()
    farm.close()


def test_dead_worker_raises_not_hangs():
    """A worker that dies during startup must raise at construction
    (with the spawn/__main__ hint), not deadlock the step barrier —
    rlpyt's crashed-worker-hangs-the-barrier failure mode, SURVEY §5.3."""
    import pytest

    from rlpyt_tpu.envs.host import SharedMemVecEnv

    import os

    parent = os.getpid()

    def bad_env():
        # builds fine in the master's probe, dies in every worker
        if os.getpid() != parent:
            raise RuntimeError("boom in worker init")
        from rlpyt_tpu.envs.host import GymEnv
        return GymEnv("CartPole-v1")

    with pytest.raises(RuntimeError, match="died during startup"):
        SharedMemVecEnv([bad_env] * 2, n_workers=2, seed=0)
