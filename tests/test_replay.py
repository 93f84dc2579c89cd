"""Replay buffer tests: ring semantics, n-step extraction, PER."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlpyt_tpu.replay.base import SamplesToBuffer
from rlpyt_tpu.replay.prioritized import PrioritizedReplayBuffer
from rlpyt_tpu.replay.uniform import UniformReplayBuffer


def make_example(obs_dim=3):
    return SamplesToBuffer(
        observation=jnp.zeros((obs_dim,)),
        action=jnp.zeros((), jnp.int32),
        reward=jnp.zeros((), jnp.float32),
        done=jnp.zeros((), jnp.bool_),
        timeout=jnp.zeros((), jnp.bool_),
    )


def make_block(t0, T, B, obs_dim=3):
    """Deterministic samples: obs[t, b] = t * 100 + b, reward = t."""
    ts = jnp.arange(t0, t0 + T, dtype=jnp.float32)[:, None]
    bs = jnp.arange(B, dtype=jnp.float32)[None, :]
    code = ts * 100 + bs
    return SamplesToBuffer(
        observation=jnp.broadcast_to(code[..., None], (T, B, obs_dim)),
        action=(ts + bs).astype(jnp.int32),
        reward=jnp.broadcast_to(ts, (T, B)),
        done=jnp.zeros((T, B), jnp.bool_),
        timeout=jnp.zeros((T, B), jnp.bool_),
    )


def test_append_cursor_and_wraparound():
    buf = UniformReplayBuffer(size=8 * 2, B=2, sample_T=4)
    state = buf.init(make_example())
    assert buf.size_T == 8
    state = buf.append(state, make_block(0, 4, 2))
    assert int(state.t) == 4 and int(state.filled_t) == 4
    state = buf.append(state, make_block(4, 4, 2))
    assert int(state.t) == 0 and int(state.filled_t) == 8
    state = buf.append(state, make_block(8, 4, 2))
    assert int(state.t) == 4 and int(state.filled_t) == 8
    # rows 0-3 now hold t=8..11; rows 4-7 hold t=4..7
    np.testing.assert_allclose(np.asarray(state.data.reward[:, 0]),
                               [8, 9, 10, 11, 4, 5, 6, 7])


def test_uniform_sample_valid_and_aligned():
    buf = UniformReplayBuffer(size=64 * 4, B=4, sample_T=16, n_step_return=1)
    state = buf.init(make_example())
    state = buf.append(state, make_block(0, 16, 4))
    batch = buf.sample(state, jax.random.key(0), 32)
    obs_code = np.asarray(batch.agent_inputs.observation[:, 0])
    t_idx = np.asarray(batch.indices[0])
    b_idx = np.asarray(batch.indices[1])
    # obs encodes its (t, b): verify gather correctness
    np.testing.assert_allclose(obs_code, t_idx * 100 + b_idx)
    # valid window respects guards: 1 <= t <= 16 - off_backward
    assert t_idx.min() >= 1
    assert t_idx.max() < 16 - buf.off_backward + 1


def test_n_step_extraction_math():
    n = 3
    buf = UniformReplayBuffer(size=32 * 2, B=2, sample_T=16,
                              n_step_return=n, discount=0.9)
    state = buf.init(make_example())
    block = make_block(0, 16, 2)
    # put a done at t=6 (all envs)
    block = block._replace(
        done=block.done.at[6].set(True))
    state = buf.append(state, block)
    t_idx = jnp.array([2, 5, 6])
    b_idx = jnp.array([0, 0, 0])
    batch = buf.extract_batch(state, t_idx, b_idx)
    # t=2: 2 + .9*3 + .81*4 = 7.94, no done
    assert float(batch.return_[0]) == pytest.approx(2 + 0.9 * 3 + 0.81 * 4)
    assert not bool(batch.done_n[0])
    # t=5: reward 5 + .9*6 then STOP (done at 6) = 10.4
    assert float(batch.return_[1]) == pytest.approx(5 + 0.9 * 6)
    assert bool(batch.done_n[1])
    # t=6: done immediately, return = 6
    assert float(batch.return_[2]) == pytest.approx(6.0)
    assert bool(batch.done_n[2])
    # target obs is at t + n
    np.testing.assert_allclose(
        np.asarray(batch.target_inputs.observation[0, 0]), 500.0)


def test_prioritized_sampling_concentrates():
    buf = PrioritizedReplayBuffer(size=64 * 1, B=1, sample_T=32,
                                  alpha=1.0, beta=1.0)
    state = buf.init(make_example())
    state = buf.append(state, make_block(0, 32, 1))
    # give row 10 a dominant (but not exclusive) priority
    pri = jnp.ones((32,))
    pri = pri.at[10].set(60.0)
    t_idx = jnp.arange(32)
    b_idx = jnp.zeros(32, jnp.int32)
    state = buf.update_priorities(state, (t_idx, b_idx), pri)
    batch = buf.sample(state, jax.random.key(0), 64)
    sel = np.asarray(batch.indices[0]) == 10
    frac_10 = np.mean(sel)
    assert frac_10 > 0.4  # ~60/88 of total mass
    assert (~sel).any()
    # importance weights: oversampled index downweighted vs the rest
    w = np.asarray(batch.is_weights)
    assert w[sel].max() < w[~sel].min()
    assert w[~sel].max() == pytest.approx(1.0, abs=1e-4)


def test_prioritized_guard_zone_masked():
    buf = PrioritizedReplayBuffer(size=16, B=1, sample_T=8, n_step_return=2)
    state = buf.init(make_example())
    state = buf.append(state, make_block(0, 8, 1))
    batch = buf.sample(state, jax.random.key(1), 128)
    t = np.asarray(batch.indices[0])
    assert t.min() >= buf.off_forward
    assert t.max() < 8 - buf.off_backward


def test_timeout_surfaces_in_window():
    buf = UniformReplayBuffer(size=32, B=1, sample_T=16, n_step_return=3)
    state = buf.init(make_example())
    block = make_block(0, 16, 1)
    block = block._replace(done=block.done.at[5].set(True),
                           timeout=block.timeout.at[5].set(True))
    state = buf.append(state, block)
    batch = buf.extract_batch(state, jnp.array([4, 8]),
                              jnp.array([0, 0]))
    assert bool(batch.timeout_n[0])   # window [4,7) contains timeout at 5
    assert not bool(batch.timeout_n[1])
