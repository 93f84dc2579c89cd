"""Frame-compressed replay (reference: rlpyt/replays/frame.py:
FrameBufferMixin, rlpyt/replays/non_sequence/frame.py:
UniformReplayFrameBuffer, PrioritizedReplayFrameBuffer).

A K-frame-stacked Atari observation is [K, H, W] uint8, but consecutive
steps share K-1 frames; storing full stacks wastes ~K× HBM.  Like the
reference, only the *newest* frame of each step is stored
([size_T, B, H, W]) and sample-time gathers reconstruct the stack from
the K trailing rows, zeroing frames that cross an episode boundary
(rlpyt's invalid-stack handling; matches the zero-padded reset stack of
the Atari env path).  On TPU the reconstruction is a batched gather —
K extra HBM reads per sampled transition, fused into the sampling
program, in exchange for 4× replay capacity.

Requires ``off_forward >= K-1`` so reconstruction never reads rows
beyond the guard zone (rlpyt frame.py sets the same guard).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rlpyt_tpu.replay.base import ReplayState, SamplesToBuffer
from rlpyt_tpu.replay.prioritized import PrioritizedReplayBuffer
from rlpyt_tpu.replay.uniform import UniformReplayBuffer


class FrameReplayMixin:
    """Compose left of a replay class: strips stacks to newest-frame at
    insert, reconstructs at sample."""

    def __init__(self, *args, frames_per_obs: int = 4, **kwargs):
        super().__init__(*args, **kwargs)
        self.frames_per_obs = frames_per_obs
        self.off_forward = max(self.off_forward, frames_per_obs - 1)

    def init(self, example: SamplesToBuffer):
        # example.observation: [K, H, W] → store a single [H, W] frame.
        ex = example._replace(
            observation=jax.tree.map(lambda o: o[-1], example.observation))
        return super().init(ex)

    def append(self, state, samples: SamplesToBuffer):
        samples = samples._replace(
            observation=jax.tree.map(lambda o: o[:, :, -1],
                                     samples.observation))
        return super().append(state, samples)

    def _obs_at(self, state, t_idx, b_idx, k: int):
        """Rebuild [batch, K, H, W] stacks from single-frame rows; frames
        from before the episode start are zeroed
        (rlpyt frame.py stack-boundary masking).  Frames are stored as
        flat rows (base.py flattened-feature layout) and reshaped once
        after the K gathers."""
        d = state.data
        K = self.frames_per_obs
        t0 = t_idx + k

        def frame_at(j):
            return jax.tree.map(
                lambda l: l[(t0 - j) % self.size_T, b_idx], d.observation)

        frames = [frame_at(0)]                       # newest
        valid = jnp.ones(t_idx.shape, jnp.bool_)
        for j in range(1, K):
            done_j = d.done[(t0 - j) % self.size_T, b_idx]
            valid = valid & ~done_j
            f = frame_at(j)
            frames.append(jax.tree.map(
                lambda l: jnp.where(
                    valid.reshape(valid.shape + (1,) * (l.ndim - 1)),
                    l, jnp.zeros_like(l)), f))
        frames = frames[::-1]                        # oldest → newest
        stacks = jax.tree.map(lambda *fs: jnp.stack(fs, axis=1), *frames)
        return self._restore_obs(stacks, t_idx.shape + (K,))


class UniformFrameReplayBuffer(FrameReplayMixin, UniformReplayBuffer):
    """(rlpyt/replays/non_sequence/frame.py:UniformReplayFrameBuffer)."""


class PrioritizedFrameReplayBuffer(FrameReplayMixin, PrioritizedReplayBuffer):
    """(rlpyt/replays/non_sequence/frame.py:PrioritizedReplayFrameBuffer)."""
