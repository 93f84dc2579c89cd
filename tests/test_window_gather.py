"""Element-window Pallas gather (ops/pallas/window_gather.py):
kernel-vs-reference math and the integrated window_kernel replay path
vs the shipped blocked-row XLA path (must be bit-identical)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlpyt_tpu.ops.pallas.window_gather import (
    gather_stacks_window,
    lane_major_append,
    lane_major_ring,
)

K, N_STEP, S = 4, 1, 4
H = W = 16                      # F = 256 = 2 lanes of 128
F = H * W
U = K + N_STEP
SIZE_T, B = 32, 3


@pytest.mark.parametrize("seed", [0, 1])
def test_kernel_matches_reference(seed):
    rng = np.random.default_rng(seed)
    ring_tm = jnp.asarray(
        rng.integers(0, 255, (SIZE_T, B, F), dtype=np.uint8))
    ring_lm = lane_major_ring(SIZE_T, B, F, U)
    for t0 in range(0, SIZE_T, 8):
        ring_lm = lane_major_append(ring_lm, ring_tm[t0:t0 + 8], t0,
                                    size_T=SIZE_T, U=U)
    batch = 9
    t_idx = jnp.asarray(rng.integers(0, SIZE_T, batch, dtype=np.int32))
    b_idx = jnp.asarray(rng.integers(0, B, batch, dtype=np.int32))
    start = (t_idx - (K - 1)) % SIZE_T
    mask_a = jnp.asarray(rng.integers(0, 2, (batch, K), dtype=np.int32))
    mask_t = jnp.asarray(rng.integers(0, 2, (batch, K), dtype=np.int32))

    out_a, out_t = gather_stacks_window(
        ring_lm, start, b_idx, mask_a, mask_t, K=K, n_step=N_STEP,
        interpret=True)

    rows = (start[:, None] + jnp.arange(U)[None, :]) % SIZE_T
    fr = ring_tm[rows, b_idx[:, None]]
    ref_a = fr[:, :K] * mask_a[:, :, None].astype(jnp.uint8)
    ref_t = fr[:, N_STEP:N_STEP + K] * mask_t[:, :, None].astype(
        jnp.uint8)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(ref_a))
    np.testing.assert_array_equal(np.asarray(out_t), np.asarray(ref_t))


def test_window_replay_path_matches_blocked_path():
    """UniformFrameReplayBuffer(window_kernel=True) must reproduce the
    shipped blocked-row XLA path bit-for-bit through extract_batch."""
    from rlpyt_tpu.ops.pallas.frame_gather import BlockedFrames
    from rlpyt_tpu.replay.base import SamplesToBuffer
    from rlpyt_tpu.replay.frame import UniformFrameReplayBuffer

    T, Bv = 8, 2
    ex = SamplesToBuffer(
        observation=jnp.zeros((K, H, W), jnp.uint8),
        action=jnp.zeros((), jnp.int32),
        reward=jnp.zeros((), jnp.float32),
        done=jnp.zeros((), jnp.bool_),
        timeout=jnp.zeros((), jnp.bool_),
    )

    def make(window):
        buf = UniformFrameReplayBuffer(
            size=T * Bv * 5, B=Bv, sample_T=T, discount=0.99,
            n_step_return=N_STEP, frames_per_obs=K, blocked_s2d=S,
            window_kernel=window)
        state = buf.init(ex)
        key = jax.random.key(0)
        for i in range(7):      # > capacity: exercises wrap + ghosts
            k = jax.random.fold_in(key, i)
            frames = jax.random.randint(k, (T, Bv, 1, H, W), 0, 256,
                                        jnp.int32).astype(jnp.uint8)
            obs = jnp.concatenate(
                [jnp.zeros((T, Bv, K - 1, H, W), jnp.uint8), frames],
                axis=2)
            done = jax.random.bernoulli(jax.random.fold_in(k, 1), 0.2,
                                        (T, Bv))
            block = SamplesToBuffer(
                observation=obs,
                action=jnp.zeros((T, Bv), jnp.int32),
                reward=jnp.arange(T * Bv, dtype=jnp.float32).reshape(
                    T, Bv) + i,
                done=done,
                timeout=jnp.zeros((T, Bv), jnp.bool_),
            )
            state = buf.append(state, block)
        return buf, state

    buf_x, st_x = make(False)
    buf_w, st_w = make(True)
    t_idx, b_idx = buf_x.sample_idxs(st_x, jax.random.key(7), 6)
    sx = buf_x.extract_batch(st_x, t_idx, b_idx)
    sw = buf_w.extract_batch(st_w, t_idx, b_idx)
    assert isinstance(sw.agent_inputs.observation, BlockedFrames)
    for name in ("action", "return_", "done", "done_n", "timeout_n"):
        np.testing.assert_array_equal(np.asarray(getattr(sx, name)),
                                      np.asarray(getattr(sw, name)))
    np.testing.assert_array_equal(
        np.asarray(sx.agent_inputs.observation.data),
        np.asarray(sw.agent_inputs.observation.data))
    np.testing.assert_array_equal(
        np.asarray(sx.target_inputs.observation.data),
        np.asarray(sw.target_inputs.observation.data))


def test_window_kernel_requires_lane_alignment():
    from rlpyt_tpu.replay.base import SamplesToBuffer
    from rlpyt_tpu.replay.frame import UniformFrameReplayBuffer

    buf = UniformFrameReplayBuffer(
        size=64, B=2, sample_T=8, n_step_return=1, frames_per_obs=K,
        blocked_s2d=4, window_kernel=True)
    ex = SamplesToBuffer(
        observation=jnp.zeros((K, 8, 8), jnp.uint8),   # F=64, not 128k
        action=jnp.zeros((), jnp.int32),
        reward=jnp.zeros((), jnp.float32),
        done=jnp.zeros((), jnp.bool_),
        timeout=jnp.zeros((), jnp.bool_),
    )
    with pytest.raises(AssertionError, match="lane-aligned"):
        buf.init(ex)
