"""Pallas fused frame-gather kernel vs pure-jnp reference
(ops/pallas/frame_gather.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlpyt_tpu.ops.pallas.frame_gather import (
    gather_frame_stacks,
    gather_frame_stacks_reference,
)

K, N_STEP, H, W, S = 4, 1, 8, 8, 4
F = H * W
SIZE_T, B = 16, 3
GH = K - 1 + N_STEP


def make_ring(key):
    from rlpyt_tpu.ops.pallas.frame_gather import block_frame_rows
    ring = jax.random.randint(key, (SIZE_T, B, F), 0, 256, jnp.int32
                              ).astype(jnp.uint8)
    # the kernel ring stores PRE-BLOCKED rows + ghost rows
    blocked = block_frame_rows(ring.reshape(SIZE_T, B, H, W), S)
    ghosted = jnp.concatenate([blocked, blocked[:GH]], axis=0)
    return ring, ghosted


@pytest.mark.parametrize("seed", [0, 1])
def test_kernel_matches_reference(seed):
    key = jax.random.key(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    ring, ghosted = make_ring(k1)
    batch = 5
    # start row in [0, SIZE_T): ghost rows cover start+U <= SIZE_T+GH
    start = jax.random.randint(k2, (batch,), 0, SIZE_T, jnp.int32)
    b_idx = jax.random.randint(k3, (batch,), 0, B, jnp.int32)
    mask_bits = jax.random.bernoulli(k4, 0.7, (2, batch, K))
    mask_a = mask_bits[0].at[:, K - 1].set(True)   # newest always valid
    mask_t = mask_bits[1].at[:, K - 1].set(True)

    ref_a, ref_t = gather_frame_stacks_reference(
        ring, start, b_idx, mask_a, mask_t,
        K=K, n_step=N_STEP, H=H, W=W, s=S)
    out_a, out_t = gather_frame_stacks(
        ghosted, start, b_idx, mask_a, mask_t,
        K=K, n_step=N_STEP, H=H, W=W, s=S, interpret=True)
    np.testing.assert_array_equal(np.asarray(out_a, np.float32),
                                  np.asarray(ref_a, np.float32))
    np.testing.assert_array_equal(np.asarray(out_t, np.float32),
                                  np.asarray(ref_t, np.float32))


def test_blocked_equals_model_s2d_layout():
    """Kernel channel order must equal Conv2dModel's raw-path s2d order
    so one set of conv params serves both paths."""
    key = jax.random.key(7)
    obs = jax.random.randint(key, (2, K, H, W), 0, 256, jnp.int32
                             ).astype(jnp.uint8)
    # model path: [B, C, H, W] -> per-frame blocked [B, C, Hb, Wb, ss]
    x = obs.reshape(2, K, H // S, S, W // S, S)
    model_blocked = x.transpose(0, 1, 2, 4, 3, 5).reshape(
        2, K, H // S, W // S, S * S)
    # kernel path on a ring holding the same frames as consecutive rows
    from rlpyt_tpu.ops.pallas.frame_gather import block_frame_rows
    ring = obs.transpose(1, 0, 2, 3)                   # [K, 2, H, W]
    ring = block_frame_rows(ring, S)                   # pre-blocked rows
    ghosted = jnp.concatenate([ring, ring[:GH]], axis=0)
    start = jnp.zeros((2,), jnp.int32)
    b_idx = jnp.arange(2, dtype=jnp.int32)
    ones = jnp.ones((2, K), jnp.uint8)
    out_a, _ = gather_frame_stacks(
        ghosted, start, b_idx, ones, ones,
        K=K, n_step=0 if False else N_STEP, H=H, W=W, s=S,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(out_a, np.float32),
                                  np.asarray(model_blocked, np.float32))


def test_blocked_replay_path_matches_jnp_path():
    """UniformFrameReplayBuffer(blocked_s2d=4) must produce the same
    stacks (modulo layout) as the plain jnp reconstruction path."""
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

    def make(blocked):
        buf = UniformFrameReplayBuffer(
            size=T * Bv * 4, B=Bv, sample_T=T, discount=0.99,
            n_step_return=N_STEP, frames_per_obs=K,
            blocked_s2d=S if blocked else None)
        state = buf.init(ex)
        key = jax.random.key(0)
        for i in range(4):
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
                reward=jnp.zeros((T, Bv), jnp.float32),
                done=done,
                timeout=jnp.zeros((T, Bv), jnp.bool_),
            )
            state = buf.append(state, block)
        return buf, state

    buf_j, st_j = make(False)
    buf_b, st_b = make(True)
    t_idx, b_idx = buf_j.sample_idxs(st_j, jax.random.key(7), 6)
    obs_j, tgt_j = buf_j._obs_pair_at(st_j, t_idx, b_idx)
    obs_b, tgt_b = buf_b._obs_pair_at(st_b, t_idx, b_idx)
    assert isinstance(obs_b, BlockedFrames)

    def block_of(stack):  # [n, K, H, W] -> batch-minor blocked 5D
        n = stack.shape[0]
        x = stack.reshape(n, K, H // S, S, W // S, S)
        x = x.transpose(0, 1, 2, 4, 3, 5).reshape(
            n, K, H // S, W // S, S * S)
        return x.transpose(1, 2, 3, 4, 0)   # BlockedFrames contract

    np.testing.assert_array_equal(
        np.asarray(obs_b.data, np.float32),
        np.asarray(block_of(obs_j), np.float32))
    np.testing.assert_array_equal(
        np.asarray(tgt_b.data, np.float32),
        np.asarray(block_of(tgt_j), np.float32))
