"""Sequence replay buffer tests (R2D1 machinery)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlpyt_tpu.replay.base import SamplesToBuffer
from rlpyt_tpu.replay.sequence import (
    PrioritizedSequenceReplayBuffer,
    UniformSequenceReplayBuffer,
)


def make_example(obs_dim=3):
    return SamplesToBuffer(
        observation=jnp.zeros((obs_dim,)),
        action=jnp.zeros((), jnp.int32),
        reward=jnp.zeros((), jnp.float32),
        done=jnp.zeros((), jnp.bool_),
        timeout=jnp.zeros((), jnp.bool_),
    )


def make_block(t0, T, B, obs_dim=3):
    ts = jnp.arange(t0, t0 + T, dtype=jnp.float32)[:, None]
    bs = jnp.arange(B, dtype=jnp.float32)[None, :]
    code = ts * 100 + bs
    return SamplesToBuffer(
        observation=jnp.broadcast_to(code[..., None], (T, B, obs_dim)),
        action=jnp.broadcast_to(ts, (T, B)).astype(jnp.int32),
        reward=jnp.broadcast_to(ts, (T, B)),
        done=jnp.zeros((T, B), jnp.bool_),
        timeout=jnp.zeros((T, B), jnp.bool_),
    )


def make_rnn(t0, T, B, iv, H=4):
    """rnn state at interval points encodes its source timestep."""
    n = T // iv
    vals = jnp.arange(t0, t0 + T, iv, dtype=jnp.float32)
    h = jnp.broadcast_to(vals[:, None, None], (n, B, H))
    return (h, h * 2)


def test_sequence_window_and_rnn_state():
    buf = PrioritizedSequenceReplayBuffer(
        size=128, B=2, sample_T=16, warmup_T=4, batch_T=8, n_step_return=2,
        interval=4)  # size is total transitions → size_T = 128/2 = 64 rows
    state = buf.init(make_example(), (jnp.zeros(4), jnp.zeros(4)))
    for i in range(4):
        state = buf.append(state, make_block(i * 16, 16, 2),
                           make_rnn(i * 16, 16, 2, 4))
    # buffer full: 64 rows
    batch = buf.sample(state, jax.random.key(0), 8)
    W = buf.window_T
    assert batch.observation.shape == (W, 8, 3)
    t0 = np.asarray(batch.slots[0]) * buf.interval
    b = np.asarray(batch.slots[1])
    # window contents line up with slot start (contiguous time)
    obs_code = np.asarray(batch.observation[:, :, 0])
    for j in range(8):
        expect = (t0[j] + np.arange(W)) % 64
        np.testing.assert_allclose(obs_code[:, j], expect * 100 + b[j])
    # init rnn state encodes the window start step
    np.testing.assert_allclose(np.asarray(batch.init_rnn_state[0][:, 0]),
                               t0 % 64)
    # prev_reward[0] is the step before the window
    np.testing.assert_allclose(np.asarray(batch.prev_reward[0]),
                               (t0 - 1) % 64)


def test_sequence_validity_not_full():
    buf = UniformSequenceReplayBuffer(
        size=64, B=1, sample_T=16, warmup_T=4, batch_T=8, n_step_return=2,
        interval=4)
    state = buf.init(make_example(), (jnp.zeros(4), jnp.zeros(4)))
    state = buf.append(state, make_block(0, 16, 1),
                       make_rnn(0, 16, 1, 4))
    batch = buf.sample(state, jax.random.key(0), 32)
    t0 = np.asarray(batch.slots[0]) * buf.interval
    # only slot 1 (row 4) fits: needs offset>=1 and offset+14 <= 16... no:
    # window_T = 4+8+2 = 14; valid slots: rows {4} only (4+14=18>16 fails!)
    # Actually offset 4: 4+14=18 > 16 → invalid.  With only 16 rows filled
    # nothing is sampleable — the masked cdf is all-zero and sampling
    # degrades to index 0 fallback.  Append another block and re-check.
    state = buf.append(state, make_block(16, 16, 1),
                       make_rnn(16, 16, 1, 4))
    batch = buf.sample(state, jax.random.key(1), 64)
    t0 = np.asarray(batch.slots[0]) * buf.interval
    assert t0.min() >= 4  # offset >= 1 ⇒ first slot excluded
    assert (t0 + buf.window_T).max() <= 32


def test_sequence_priorities_concentrate():
    buf = PrioritizedSequenceReplayBuffer(
        size=64, B=1, sample_T=16, warmup_T=0, batch_T=8, n_step_return=1,
        interval=8, alpha=1.0)
    state = buf.init(make_example(), (jnp.zeros(4), jnp.zeros(4)))
    for i in range(4):
        state = buf.append(state, make_block(i * 16, 16, 1),
                           make_rnn(i * 16, 16, 1, 8))
    slots = jnp.arange(8)
    state = buf.update_priorities(
        state, (slots, jnp.zeros(8, jnp.int32)),
        jnp.array([0.01, 0.01, 60.0, 0.01, 0.01, 0.01, 0.01, 0.01]))
    batch = buf.sample(state, jax.random.key(0), 64)
    frac = np.mean(np.asarray(batch.slots[0]) == 2)
    assert frac > 0.8


def test_input_priorities_applied_at_append():
    buf = PrioritizedSequenceReplayBuffer(
        size=32, B=1, sample_T=16, warmup_T=0, batch_T=4, n_step_return=1,
        interval=8, alpha=1.0)
    state = buf.init(make_example(), (jnp.zeros(4), jnp.zeros(4)))
    in_pri = jnp.array([[5.0], [0.5]])
    state = buf.append(state, make_block(0, 16, 1),
                       make_rnn(0, 16, 1, 8), input_priorities=in_pri)
    np.testing.assert_allclose(np.asarray(state.priorities[:2, 0]),
                               [5.0, 0.5])


def make_stacked_example(K=4, H=2, W=2):
    return SamplesToBuffer(
        observation=jnp.zeros((K, H, W), jnp.uint8),
        action=jnp.zeros((), jnp.int32),
        reward=jnp.zeros((), jnp.float32),
        done=jnp.zeros((), jnp.bool_),
        timeout=jnp.zeros((), jnp.bool_),
    )


def make_stacked_traj(T, B, done_at=(), K=4, H=2, W=2):
    """One continuous trajectory: frame value at step t is t+1 (avoid 0 =
    the boundary pad); stacks are built exactly as the env would:
    [t-K+1 .. t] with zeros before episode starts (auto-reset at done)."""
    dones = np.zeros((T, B), bool)
    for t in done_at:
        dones[t] = True
    obs = np.zeros((T, B, K, H, W), np.uint8)
    for b in range(B):
        start = 0
        for t in range(T):
            for k in range(K):
                src = t - (K - 1 - k)
                if src >= start:
                    obs[t, b, k] = (src + 1) % 256
            if dones[t, b]:
                start = t + 1
    return SamplesToBuffer(
        observation=jnp.asarray(obs),
        action=jnp.zeros((T, B), jnp.int32),
        reward=jnp.zeros((T, B), jnp.float32),
        done=jnp.asarray(dones),
        timeout=jnp.zeros((T, B), jnp.bool_),
    )


def test_sequence_frame_reconstruction():
    from rlpyt_tpu.replay.sequence import UniformSequenceFrameReplayBuffer

    K = 4
    buf = UniformSequenceFrameReplayBuffer(
        size=64, B=1, sample_T=16, warmup_T=2, batch_T=4, n_step_return=1,
        interval=2, frames_per_obs=K)
    # Uncompressed twin for ground truth.
    ref = UniformSequenceReplayBuffer(
        size=64, B=1, sample_T=16, warmup_T=2, batch_T=4, n_step_return=1,
        interval=2)
    ref.off_start = buf.off_start  # align sampleable slots
    rnn0 = (jnp.zeros(4), jnp.zeros(4))
    state = buf.init(make_stacked_example(K), rnn0)
    state_ref = ref.init(make_stacked_example(K), rnn0)
    # storage really is single-frame (flat rows: flattened-feature layout)
    assert state.data.observation.shape == (64, 1, 4)
    traj = make_stacked_traj(80, 1, done_at=(5, 11, 21, 37, 59, 66), K=K)
    for i in range(5):
        block = jax.tree.map(lambda l: l[i * 16:(i + 1) * 16], traj)
        rnn = make_rnn(i * 16, 16, 1, 2)
        state = buf.append(state, block, rnn)
        state_ref = ref.append(state_ref, block, rnn)
    key = jax.random.key(3)
    batch = buf.sample(state, key, 16)
    batch_ref = ref.sample(state_ref, key, 16)
    np.testing.assert_array_equal(np.asarray(batch.slots[0]),
                                  np.asarray(batch_ref.slots[0]))
    np.testing.assert_array_equal(np.asarray(batch.observation),
                                  np.asarray(batch_ref.observation))


def test_r2d1_frame_compress_learns_shapes():
    """R2D1 with frame_compress builds and runs one optimize step.

    MinAtar has no temporal frame stack; this treats its 4 channels as
    the stack axis purely to exercise the fused window-gather +
    reconstruction program end-to-end (values are exercised by
    test_sequence_frame_reconstruction)."""
    from rlpyt_tpu.agents.dqn import R2d1Agent
    from rlpyt_tpu.algos.r2d1 import R2D1
    from rlpyt_tpu.envs.minatar import Breakout
    from rlpyt_tpu.models.dqn import AtariR2d1Model
    from rlpyt_tpu.runners.train import MinibatchRl
    from rlpyt_tpu.samplers.rollout import BatchSpec

    agent = R2d1Agent(
        ModelCls=AtariR2d1Model,
        model_kwargs=dict(channels=(8,), kernel_sizes=(3,), strides=(1,),
                          paddings=(0,), fc_sizes=(32,), lstm_size=32,
                          obs_divisor=1.0),
        eps_steps=100)
    algo = R2D1(batch_b=4, batch_T=8, warmup_T=4, min_steps_learn=0,
                replay_size=2048, replay_ratio=4.0, n_step_return=1,
                target_update_interval=5, input_priorities=True,
                frame_compress=True, frames_per_obs=4)
    runner = MinibatchRl(algo=algo, agent=agent, env=Breakout(),
                         batch_spec=BatchSpec(T=16, B=8), n_steps=16 * 8 * 2,
                         seed=0, log_interval_steps=16 * 8,
                         max_decorrelation_steps=0)
    carry = runner.startup()
    carry, infos, _ = runner._run_interval(carry)
    assert np.isfinite(float(np.mean(np.asarray(infos.loss))))
