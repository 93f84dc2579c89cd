"""Sequence replay buffers for recurrent training (reference:
rlpyt/replays/sequence/n_step.py:SequenceNStepReturnBuffer,
sequence/prioritized.py:PrioritizedSequenceReplayBuffer,
sequence/uniform.py:UniformSequenceReplayBuffer).

R2D1's replay: fixed-length windows (warmup_T burn-in + batch_T training +
n_step target overhang) with the recurrent state stored at allowed window
starts.  Window starts are restricted to multiples of ``interval``
(rlpyt's rnn_state_interval/priority_interval), so the rnn-state side
array is [size_T/interval, B, H] — 40× smaller than storing per-step.

Priorities are per-start-slot; new sequences may be given *input
priorities* computed by the algorithm from collection-time TD errors
(rlpyt r2d1.py input_priorities option) via ``append(...,
input_priorities=...)``; otherwise they default to the max seen.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from rlpyt_tpu.replay.base import SamplesToBuffer
from rlpyt_tpu.struct import buffer_from_example, tree_dynamic_set


class SequenceReplayState(NamedTuple):
    data: Any              # SamplesToBuffer pytree [size_T, B, ...]
    rnn_state: Any         # (h, c) each [n_slots, B, H]
    priorities: jax.Array  # [n_slots, B] (p^α; ones-like for uniform)
    max_priority: jax.Array
    t: jax.Array           # cursor row
    filled_t: jax.Array


class SequenceSamples(NamedTuple):
    """A [W, b] window batch (rlpyt sequence SamplesFromReplay).

    W = warmup_T + batch_T + n_step; leaves are time-major [W, b, ...]."""

    observation: Any
    action: Any
    reward: jax.Array
    done: jax.Array
    prev_action: Any
    prev_reward: jax.Array
    init_rnn_state: Any    # [b, H] state at window start
    is_weights: jax.Array  # [b]
    slots: Tuple[jax.Array, jax.Array]  # (slot_idx, b_idx)


class PrioritizedSequenceReplayBuffer:
    def __init__(self, size: int, B: int, sample_T: int,
                 warmup_T: int = 40, batch_T: int = 80,
                 n_step_return: int = 1, discount: float = 0.99,
                 interval: Optional[int] = None,
                 alpha: float = 0.6, beta: float = 0.4,
                 prioritized: bool = True):
        self.B = B
        self.sample_T = sample_T
        self.warmup_T = warmup_T
        self.batch_T = batch_T
        self.n_step = n_step_return
        self.discount = discount
        self.window_T = warmup_T + batch_T + n_step_return
        self.interval = interval or max(1, min(warmup_T or batch_T,
                                               sample_T))
        assert sample_T % self.interval == 0, (
            "sampler batch_T must be a multiple of the rnn-state interval")
        size_T = -(-size // B)
        self.size_T = -(-size_T // sample_T) * sample_T
        self.n_slots = self.size_T // self.interval
        self.alpha = alpha
        self.beta = beta
        self.prioritized = prioritized
        # Min offset of a window start from the oldest valid row; ≥1 for
        # the prev_action/prev_reward access, raised by the frame mixin.
        self.off_start = 1

    @property
    def size(self):
        return self.size_T * self.B

    # ------------------------------------------------------------------

    def init(self, example: SamplesToBuffer, rnn_example) -> SequenceReplayState:
        """``rnn_example``: per-env rnn state pytree with leaves [H]."""
        from rlpyt_tpu.replay.base import BaseReplayBuffer
        self._obs_shapes = [o.shape for o in
                            jax.tree.leaves(example.observation)]
        example = example._replace(
            observation=BaseReplayBuffer._flatten_obs(
                example.observation, lead=0))
        data = buffer_from_example(example, (self.size_T, self.B))
        rnn = buffer_from_example(rnn_example, (self.n_slots, self.B))
        return SequenceReplayState(
            data=data, rnn_state=rnn,
            priorities=jnp.zeros((self.n_slots, self.B), jnp.float32),
            max_priority=jnp.ones((), jnp.float32),
            t=jnp.zeros((), jnp.int32),
            filled_t=jnp.zeros((), jnp.int32))

    def append(self, state: SequenceReplayState, samples: SamplesToBuffer,
               rnn_states, input_priorities: Optional[jax.Array] = None
               ) -> SequenceReplayState:
        """Insert [T, B] samples + rnn states at the T/interval slot points.

        ``rnn_states``: pytree with leaves [T/interval, B, H] — the agent
        state at steps {0, interval, ...} of the block (the collector's
        stored ``prev_rnn_state`` subsampled by the algo).
        ``input_priorities``: optional [T/interval, B] pre-α priorities.
        """
        from rlpyt_tpu.replay.base import BaseReplayBuffer
        samples = samples._replace(
            observation=BaseReplayBuffer._flatten_obs(
                samples.observation, lead=2))
        data = tree_dynamic_set(state.data, state.t, samples, axis=0)
        slot0 = state.t // self.interval
        n_new = self.sample_T // self.interval
        rnn = tree_dynamic_set(state.rnn_state, slot0, rnn_states, axis=0)
        if input_priorities is None:
            new_p = jnp.full((n_new, self.B),
                             state.max_priority ** self.alpha)
        else:
            new_p = jnp.maximum(input_priorities, 1e-6) ** self.alpha
        priorities = jax.lax.dynamic_update_slice(
            state.priorities, new_p, (slot0, jnp.zeros((), jnp.int32)))
        t = (state.t + self.sample_T) % self.size_T
        filled = jnp.minimum(state.filled_t + self.sample_T, self.size_T)
        return SequenceReplayState(
            data=data, rnn_state=rnn, priorities=priorities,
            max_priority=state.max_priority, t=t, filled_t=filled)

    # ------------------------------------------------------------------

    def _slot_validity(self, state: SequenceReplayState) -> jax.Array:
        """[n_slots] bool: the full window fits in contiguous valid data."""
        full = state.filled_t >= self.size_T
        base = jnp.where(full, state.t, 0)
        span = jnp.where(full, self.size_T, state.filled_t)
        slot_rows = jnp.arange(self.n_slots, dtype=jnp.int32) * self.interval
        offset = (slot_rows - base) % self.size_T
        # offset >= off_start guards the prev_action/prev_reward access at
        # t0 - 1 (and trailing-frame reads under frame compression).
        return (offset >= self.off_start) & (
            offset + self.window_T <= span)

    def sample(self, state: SequenceReplayState, key: jax.Array,
               batch_b: int) -> SequenceSamples:
        valid = self._slot_validity(state)
        if self.prioritized:
            p = jnp.where(valid[:, None], state.priorities, 0.0)
        else:
            p = jnp.where(valid[:, None],
                          jnp.ones_like(state.priorities), 0.0)
        flat = p.reshape(-1)
        cdf = jnp.cumsum(flat)
        total = cdf[-1]
        u = jax.random.uniform(key, (batch_b,))
        targets = (jnp.arange(batch_b) + u) * (total / batch_b)
        flat_idx = jnp.minimum(
            jnp.searchsorted(cdf, targets, side="right"),
            flat.shape[0] - 1)
        slot_idx = (flat_idx // self.B).astype(jnp.int32)
        b_idx = (flat_idx % self.B).astype(jnp.int32)

        n_valid = jnp.maximum(jnp.sum(flat > 0), 1)
        probs = flat[flat_idx] / jnp.maximum(total, 1e-12)
        w = (1.0 / (n_valid.astype(jnp.float32)
                    * jnp.maximum(probs, 1e-12))) ** self.beta
        w = w / jnp.maximum(jnp.max(w), 1e-12)
        if not self.prioritized:
            w = jnp.ones_like(w)

        t0 = slot_idx * self.interval
        W = self.window_T
        d = state.data

        def window(leaf):
            # [W, b, ...] gather with ring wraparound
            rows = (t0[None, :] + jnp.arange(W)[:, None]) % self.size_T
            return leaf[rows, b_idx[None, :]]

        obs = self._obs_window(state, t0, b_idx)
        action = window(d.action)
        reward = window(d.reward)
        done = window(d.done)

        def window_prev(leaf):
            rows = (t0[None, :] - 1 + jnp.arange(W)[:, None]) % self.size_T
            return leaf[rows, b_idx[None, :]]

        prev_action = window_prev(d.action)
        prev_reward = window_prev(d.reward)
        init_rnn = jax.tree.map(lambda l: l[slot_idx, b_idx],
                                state.rnn_state)
        return SequenceSamples(
            observation=obs, action=action, reward=reward, done=done,
            prev_action=prev_action, prev_reward=prev_reward,
            init_rnn_state=init_rnn, is_weights=w,
            slots=(slot_idx, b_idx))

    def _restore_obs(self, gathered, batch_shape: tuple):
        """Reshape row-gathered obs leaves back to their feature shapes
        (base.py flattened-feature layout)."""
        leaves, treedef = jax.tree.flatten(gathered)
        out = [l.reshape(batch_shape + shp) if len(shp) > 1 else l
               for l, shp in zip(leaves, self._obs_shapes)]
        return jax.tree.unflatten(treedef, out)

    def _obs_window(self, state: SequenceReplayState, t0: jax.Array,
                    b_idx: jax.Array):
        """Gather [W, b, ...] observation windows; overridden by the frame
        mixin to reconstruct stacks from single-frame storage."""
        rows = (t0[None, :]
                + jnp.arange(self.window_T)[:, None]) % self.size_T
        flat = jax.tree.map(lambda l: l[rows, b_idx[None, :]],
                            state.data.observation)
        return self._restore_obs(flat, rows.shape)

    def update_priorities(self, state: SequenceReplayState,
                          slots: Tuple[jax.Array, jax.Array],
                          priorities: jax.Array) -> SequenceReplayState:
        if not self.prioritized:
            return state
        slot_idx, b_idx = slots
        p = jnp.maximum(priorities, 1e-6)
        new = state.priorities.at[slot_idx, b_idx].set(p ** self.alpha)
        max_p = jnp.maximum(state.max_priority, jnp.max(p))
        return state._replace(priorities=new, max_priority=max_p)


class UniformSequenceReplayBuffer(PrioritizedSequenceReplayBuffer):
    """(rlpyt/replays/sequence/uniform.py) — same machinery, flat
    sampling probabilities and unit importance weights."""

    def __init__(self, *args, **kwargs):
        kwargs["prioritized"] = False
        super().__init__(*args, **kwargs)


class SequenceFrameReplayMixin:
    """Frame compression for sequence windows (reference:
    rlpyt/replays/sequence/frame.py:SequenceNStepFrameBuffer +
    uniform/prioritized combos).

    Stores only the newest [H, W] frame of each K-stacked observation
    (~K× HBM saving — the R2D1 Atari buffer is the largest array in the
    framework) and reconstructs the per-step stacks at sample time with
    episode-boundary zeroing, fused into the same gather program as the
    window extraction."""

    def __init__(self, *args, frames_per_obs: int = 4, **kwargs):
        super().__init__(*args, **kwargs)
        self.frames_per_obs = frames_per_obs
        self.off_start = max(self.off_start, frames_per_obs - 1)

    def init(self, example: SamplesToBuffer, rnn_example):
        ex = example._replace(
            observation=jax.tree.map(lambda o: o[-1], example.observation))
        return super().init(ex, rnn_example)

    def append(self, state, samples: SamplesToBuffer, rnn_states,
               input_priorities=None):
        samples = samples._replace(
            observation=jax.tree.map(lambda o: o[:, :, -1],
                                     samples.observation))
        return super().append(state, samples, rnn_states, input_priorities)

    def _obs_window(self, state: SequenceReplayState, t0: jax.Array,
                    b_idx: jax.Array):
        d = state.data
        K = self.frames_per_obs
        rows = (t0[None, :]
                + jnp.arange(self.window_T)[:, None]) % self.size_T  # [W,b]
        b = b_idx[None, :]

        def frame_at(j):
            return jax.tree.map(
                lambda l: l[(rows - j) % self.size_T, b], d.observation)

        frames = [frame_at(0)]                       # newest
        valid = jnp.ones(rows.shape, jnp.bool_)      # [W, b]
        for j in range(1, K):
            done_j = d.done[(rows - j) % self.size_T, b]
            valid = valid & ~done_j
            f = frame_at(j)
            frames.append(jax.tree.map(
                lambda l: jnp.where(
                    valid.reshape(valid.shape + (1,) * (l.ndim - 2)),
                    l, jnp.zeros_like(l)), f))
        frames = frames[::-1]                        # oldest → newest
        stacks = jax.tree.map(lambda *fs: jnp.stack(fs, axis=2), *frames)
        return self._restore_obs(stacks, rows.shape + (K,))


class PrioritizedSequenceFrameReplayBuffer(SequenceFrameReplayMixin,
                                           PrioritizedSequenceReplayBuffer):
    """(rlpyt/replays/sequence/frame.py prioritized frame combo)."""


class UniformSequenceFrameReplayBuffer(SequenceFrameReplayMixin,
                                       UniformSequenceReplayBuffer):
    """(rlpyt/replays/sequence/frame.py uniform frame combo)."""
