"""Uniform replay (reference: rlpyt/replays/non_sequence/uniform.py:
UniformReplayBuffer; the time-limit-aware variant TlUniformReplayBuffer is
subsumed — ``timeout`` is always stored and surfaced as ``timeout_n``).
"""
from __future__ import annotations

import jax

from rlpyt_tpu.replay.base import BaseReplayBuffer, ReplayState, SamplesFromReplay


class UniformReplayBuffer(BaseReplayBuffer):
    def sample(self, state: ReplayState, key: jax.Array,
               batch_size: int) -> SamplesFromReplay:
        t_idx, b_idx = self.sample_idxs(state, key, batch_size)
        return self.extract_batch(state, t_idx, b_idx)

    def update_priorities(self, state: ReplayState, indices, priorities
                          ) -> ReplayState:
        return state  # no-op for uniform
