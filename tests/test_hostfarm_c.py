"""C futex barrier data plane for the host env farm (csrc/hostfarm.c)."""
import numpy as np
import pytest

from rlpyt_tpu.envs import hostfarm_c
from rlpyt_tpu.envs.host import SharedMemVecEnv

pytestmark = pytest.mark.skipif(
    hostfarm_c.get_lib() is None,
    reason="hostfarm C library unavailable (no cc / not linux)")


def make_farm(sync, B=4, W=2, seed=7):
    return SharedMemVecEnv(["CartPole-v1"] * B, n_workers=W, seed=seed,
                           sync=sync)


def run_farm(farm, n_steps=50):
    obs0 = farm.reset().copy()
    rng = np.random.RandomState(0)
    trace = [obs0]
    for _ in range(n_steps):
        acts = rng.randint(0, 2, size=(farm.B,))
        obs, rew, done, timeout = farm.step(acts)
        trace.append(np.concatenate(
            [obs.ravel(), rew, done.astype(np.float32)]))
    farm.close()
    return trace


def test_c_sync_selected_and_steps():
    farm = make_farm("c")
    assert farm.sync_impl == "c"
    obs = farm.reset()
    assert obs.shape == (4, 4)
    for _ in range(20):
        obs, rew, done, timeout = farm.step(np.zeros(4, np.int64))
    assert np.isfinite(obs).all()
    farm.close()


def test_c_and_event_paths_identical():
    t_c = run_farm(make_farm("c"))
    t_e = run_farm(make_farm("events"))
    for a, b in zip(t_c, t_e):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_barrier_many_rounds():
    """Stress the barrier ordering: no lost wakeups over many rounds."""
    farm = make_farm("c", B=8, W=4)
    farm.reset()
    for i in range(300):
        obs, rew, done, timeout = farm.step(
            np.full(8, i % 2, dtype=np.int64))
    farm.close()
