"""Frame-compressed replay: stack reconstruction + boundary masking."""
import jax
import jax.numpy as jnp
import numpy as np

from rlpyt_tpu.replay.base import SamplesToBuffer
from rlpyt_tpu.replay.frame import (
    PrioritizedFrameReplayBuffer,
    UniformFrameReplayBuffer,
)

H = W = 4
K = 3


def example():
    return SamplesToBuffer(
        observation=jnp.zeros((K, H, W), jnp.uint8),
        action=jnp.zeros((), jnp.int32),
        reward=jnp.zeros((), jnp.float32),
        done=jnp.zeros((), jnp.bool_),
        timeout=jnp.zeros((), jnp.bool_),
    )


def block(t0, T, B, done_rows=()):
    """Newest frame of step t is filled with value t+1 (0 = invalid)."""
    ts = jnp.arange(t0, t0 + T)
    frames = jnp.broadcast_to((ts + 1)[:, None, None, None, None],
                              (T, B, 1, H, W)).astype(jnp.uint8)
    obs = jnp.concatenate(
        [jnp.zeros((T, B, K - 1, H, W), jnp.uint8), frames], axis=2)
    done = jnp.zeros((T, B), jnp.bool_)
    for r in done_rows:
        done = done.at[r - t0].set(True)
    return SamplesToBuffer(
        observation=obs,
        action=jnp.broadcast_to(ts[:, None], (T, B)).astype(jnp.int32),
        reward=jnp.broadcast_to(ts[:, None], (T, B)).astype(jnp.float32),
        done=done,
        timeout=jnp.zeros((T, B), jnp.bool_),
    )


def test_storage_is_compressed():
    buf = UniformFrameReplayBuffer(size=64, B=2, sample_T=8,
                                   frames_per_obs=K)
    state = buf.init(example())
    # stored obs is one frame per step, not K — kept as flat rows
    # (replay/base.py flattened-feature layout for fast TPU gathers)
    assert state.data.observation.shape == (buf.size_T, 2, H * W)


def test_stack_reconstruction():
    buf = UniformFrameReplayBuffer(size=32, B=1, sample_T=8, n_step_return=1,
                                   frames_per_obs=K)
    state = buf.init(example())
    for i in range(4):
        state = buf.append(state, block(i * 8, 8, 1))
    t_idx = jnp.array([10, 20])
    b_idx = jnp.array([0, 0])
    batch = buf.extract_batch(state, t_idx, b_idx)
    obs = np.asarray(batch.agent_inputs.observation)
    assert obs.shape == (2, K, H, W)
    # stack for step t = frames [t-2, t-1, t] = values [t-1, t, t+1]
    np.testing.assert_array_equal(obs[0, :, 0, 0], [9, 10, 11])
    np.testing.assert_array_equal(obs[1, :, 0, 0], [19, 20, 21])
    # target stack at t + n_step
    tobs = np.asarray(batch.target_inputs.observation)
    np.testing.assert_array_equal(tobs[0, :, 0, 0], [10, 11, 12])


def test_episode_boundary_zeroing():
    buf = UniformFrameReplayBuffer(size=32, B=1, sample_T=8, n_step_return=1,
                                   frames_per_obs=K)
    state = buf.init(example())
    # done at step 9 ⇒ obs 10 starts a new episode
    state = buf.append(state, block(0, 8, 1))
    state = buf.append(state, block(8, 8, 1, done_rows=(9,)))
    state = buf.append(state, block(16, 8, 1))
    state = buf.append(state, block(24, 8, 1))
    batch = buf.extract_batch(state, jnp.array([10, 11, 12]),
                              jnp.array([0, 0, 0]))
    obs = np.asarray(batch.agent_inputs.observation)
    # obs 10: frames 8,9 precede the reset → zeroed
    np.testing.assert_array_equal(obs[0, :, 0, 0], [0, 0, 11])
    # obs 11: frame 9 precedes the reset → zeroed; frame 10 valid
    np.testing.assert_array_equal(obs[1, :, 0, 0], [0, 11, 12])
    # obs 12: fully within the new episode
    np.testing.assert_array_equal(obs[2, :, 0, 0], [11, 12, 13])


def test_prioritized_frame_combo():
    buf = PrioritizedFrameReplayBuffer(size=32, B=2, sample_T=8,
                                       frames_per_obs=K, alpha=0.6, beta=0.4)
    state = buf.init(example())
    for i in range(4):
        state = buf.append(state, block(i * 8, 8, 2))
    batch = buf.sample(state, jax.random.key(0), 16)
    assert batch.agent_inputs.observation.shape == (16, K, H, W)
    assert bool(jnp.all(batch.is_weights > 0))
    # guard zone respects frame context: off_forward >= K-1
    assert buf.off_forward >= K - 1
    state = buf.update_priorities(state, batch.indices,
                                  jnp.ones(16) * 2.0)
    assert float(state.max_priority) >= 2.0
