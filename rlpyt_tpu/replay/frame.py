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
    insert, reconstructs at sample.

    ``blocked_s2d``: when set to the first conv's stride s, rows are
    stored pre-blocked in the space-to-depth conv layout and sampling is
    ONE row gather + reshapes, returning ``BlockedFrames`` observations
    — no per-frame selects, no stack concatenate, no in-model s2d
    relayout.  This is the blocked-row XLA gather path; the fused Pallas
    DMA kernel (ops/pallas/frame_gather.py) is experimental and does NOT
    ship (Mosaic rejects its single-lane row slices on real hardware).
    Requires a single bare-array [K, H, W] observation with H, W
    divisible by s."""

    def __init__(self, *args, frames_per_obs: int = 4,
                 blocked_s2d: int | None = None,
                 window_kernel: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        self.frames_per_obs = frames_per_obs
        self.off_forward = max(self.off_forward, frames_per_obs - 1)
        self.blocked_s2d = blocked_s2d
        # Pallas Element-window sampling (ops/pallas/window_gather.py):
        # rows stored LANE-MAJOR with ghost rows so each sample's union
        # window is one contiguous DMA; masks apply in-kernel.
        # EXPERIMENTAL and default OFF: bit-exact vs the shipped path
        # (tests/test_window_gather.py) but measured 3x slower in the
        # flagship program (see the kernel module docstring).
        self.window_kernel = window_kernel
        assert not window_kernel or blocked_s2d, (
            "window_kernel requires blocked_s2d rows")

    def init(self, example: SamplesToBuffer):
        # example.observation: [K, H, W] → store a single [H, W] frame.
        ex = example._replace(
            observation=jax.tree.map(lambda o: o[-1], example.observation))
        state = super().init(ex)
        if self.blocked_s2d:
            assert len(jax.tree.leaves(example.observation)) == 1, (
                "blocked_s2d needs a single bare-array observation")
            self._frame_hw = jax.tree.leaves(example.observation)[0].shape[-2:]
            H, W = self._frame_hw
            s = self.blocked_s2d
            assert H % s == 0 and W % s == 0, (H, W, s)
        if self.window_kernel:
            from rlpyt_tpu.ops.pallas.window_gather import lane_major_ring
            H, W = self._frame_hw
            F = H * W
            U = self.frames_per_obs + self.n_step
            assert F % 128 == 0, (
                f"window_kernel needs lane-aligned rows (F={F}); use "
                "blocked_frame_sampling without window_gather_kernel")
            assert self.sample_T >= U - 1, (
                "window_kernel ghost-row mirror needs sample_T >= "
                f"K+n-1 (got T={self.sample_T}, U-1={U - 1})")
            ring = lane_major_ring(self.size_T, self.B, F, U)
            state = state._replace(data=state.data._replace(
                observation=jax.tree.map(lambda _: ring,
                                         state.data.observation)))
        return state

    def append(self, state, samples: SamplesToBuffer):
        samples = samples._replace(
            observation=jax.tree.map(lambda o: o[:, :, -1],
                                     samples.observation))
        if self.blocked_s2d:
            # Pre-block at insert (paid once per collected frame) so
            # the sample-side kernel is a pure masked copy — the
            # space-to-depth interleave never runs at sample time.
            from rlpyt_tpu.ops.pallas.frame_gather import block_frame_rows
            samples = samples._replace(
                observation=jax.tree.map(
                    lambda o: block_frame_rows(o, self.blocked_s2d),
                    samples.observation))
        if self.window_kernel:
            return self._append_lane_major(state, samples)
        return super().append(state, samples)

    def _append_lane_major(self, state, samples):
        """Window-kernel storage write: obs rows go to the lane-major
        ghost ring (one [B, T, F] dynamic_update_slice + a ghost mirror
        when the block covers rows [0, U-1)); the other leaves take the
        generic time-major path (replay/base.py:append)."""
        from rlpyt_tpu.ops.pallas.window_gather import lane_major_append
        from rlpyt_tpu.struct import tree_dynamic_set

        U = self.frames_per_obs + self.n_step
        obs_blk = jax.tree.leaves(samples.observation)[0]   # [T, B, F]
        ring = jax.tree.leaves(state.data.observation)[0]
        ring = lane_major_append(ring, obs_blk, state.t,
                                 size_T=self.size_T, U=U)
        data = tree_dynamic_set(
            state.data._replace(observation=None), state.t,
            samples._replace(observation=None), axis=0)
        data = data._replace(observation=jax.tree.map(
            lambda _: ring, state.data.observation))
        t = (state.t + self.sample_T) % self.size_T
        filled = jnp.minimum(state.filled_t + self.sample_T, self.size_T)
        return ReplayState(data=data, t=t, filled_t=filled)

    def _stack_masks(self, dones_u, starts):
        """Validity masks from the union done rows.  ``dones_u`` is
        [batch, U-1] with column q = done at union row q+1's *previous*
        row... (see _gather_union); ``starts`` are the union positions of
        each requested stack's oldest frame.  A stack frame at lag j>0
        (j frames before the stack's newest) is zeroed when any done sits
        strictly between it and the newest frame — rlpyt frame.py's
        stack-boundary masking, here as index math instead of K-1
        where-selects over full frames."""
        masks = []
        K = self.frames_per_obs
        bsz = dones_u.shape[0]
        for s in starts:
            seg = dones_u[:, s:s + K - 1]           # [batch, K-1]
            suffix_any = jnp.cumsum(
                seg[:, ::-1].astype(jnp.int32), axis=1)[:, ::-1] > 0
            masks.append(jnp.concatenate(
                [~suffix_any, jnp.ones((bsz, 1), jnp.bool_)], axis=1))
        return masks

    def _gather_union(self, state, t_idx, b_idx, n_extra: int, starts):
        """ONE gather of the union frame window [t-K+1, t+n_extra] per
        obs leaf (consecutive stacks share K-1 frames; gathering per
        stack would re-read them), then per-stack masked views.  The
        mask is applied as a 0/1 multiply on the stored dtype so XLA
        fuses it into the consumer's uint8→compute-dtype convert instead
        of materializing K-1 full-frame selects (measured on v5e at
        B=4096: the select/pad/copy chain was ~40% of DQN update time)."""
        assert t_idx.ndim == 1, "union gather expects 1-D (t, b) indices"
        d = state.data
        K = self.frames_per_obs
        U = K + n_extra                              # union window length
        # union row p (0-based, oldest first) = t_idx - (K-1) + p
        rows_u = (t_idx[:, None] - (K - 1)
                  + jnp.arange(U)[None, :]) % self.size_T   # [batch, U]
        b2 = b_idx[:, None]
        # done at union row p for p in 0..U-2 (the rows a later frame
        # would look back across)
        dones_u = d.done[rows_u[:, :-1], b2]         # [batch, U-1]
        masks = self._stack_masks(dones_u, starts)

        def stacks_of(leaf):
            fr = leaf[rows_u, b2]                    # [batch, U, F] 1 gather
            out = []
            for s, m in zip(starts, masks):
                win = jax.lax.slice_in_dim(fr, s, s + K, axis=1)
                out.append(win * m[:, :, None].astype(win.dtype))
            return out

        per_leaf = jax.tree.map(stacks_of, d.observation)
        shape = t_idx.shape + (K,)
        return [self._restore_obs(
                    jax.tree.map(lambda lst, i=i: lst[i], per_leaf,
                                 is_leaf=lambda x: isinstance(x, list)),
                    shape)
                for i in range(len(starts))]

    def _obs_at(self, state, t_idx, b_idx, k: int):
        """Single-stack reconstruction (kept for non-paired callers)."""
        assert not self.blocked_s2d, (
            "blocked_s2d rings store pre-blocked rows; only the paired "
            "kernel path (_obs_pair_at) reads them")
        (obs,) = self._gather_union(state, t_idx + k, b_idx, 0, (0,))
        return obs

    def _obs_pair_at(self, state, t_idx, b_idx):
        """(obs_t, obs_{t+n}) from one union gather of K+n frames."""
        if self.blocked_s2d:
            return self._obs_pair_blocked(state, t_idx, b_idx)
        obs, target = self._gather_union(state, t_idx, b_idx,
                                         self.n_step, (0, self.n_step))
        return obs, target

    def _obs_pair_blocked(self, state, t_idx, b_idx):
        """Blocked-row sample path: rows are pre-blocked at insert, so
        sampling is ONE row gather + a 16-byte-run uint8 K-interleave
        transpose + fused mask/convert — no per-frame selects, no stack
        concatenate, no in-model space-to-depth relayout (the XLA chain
        those cost ~40% of the flagship update,
        profiles/flagship_profile_B2048.json).  A Pallas DMA variant
        exists (ops/pallas/frame_gather.py) but Mosaic's HBM tiling
        rules forbid single-lane row slices; the XLA gather is kept as
        the shipping path."""
        from rlpyt_tpu.ops.pallas.frame_gather import BlockedFrames

        assert t_idx.ndim == 1, "blocked sampling expects 1-D indices"
        d = state.data
        K = self.frames_per_obs
        n = self.n_step
        U = K + n
        s = self.blocked_s2d
        H, W = self._frame_hw
        Hb, Wb = H // s, W // s
        P, ss = Hb * Wb, s * s
        batch = t_idx.shape[0]
        rows_u = (t_idx[:, None] - (K - 1)
                  + jnp.arange(U)[None, :]) % self.size_T
        b2 = b_idx[:, None]
        dones_u = d.done[rows_u[:, :-1], b2]
        mask_a, mask_t = self._stack_masks(dones_u, (0, n))

        if self.window_kernel:
            from rlpyt_tpu.ops.pallas.window_gather import (
                gather_stacks_window,
            )
            ring = jax.tree.leaves(d.observation)[0]  # [B, NT, F]
            start = (t_idx - (K - 1)) % self.size_T
            rows_a, rows_t = gather_stacks_window(
                ring, start, b_idx,
                mask_a.astype(jnp.int32), mask_t.astype(jnp.int32),
                K=K, n_step=n,
                interpret=jax.default_backend() != "tpu")

            def finish(rows):
                x = rows.reshape(batch, K, Hb, Wb, ss)
                x = jax.lax.optimization_barrier(
                    x.transpose(1, 2, 3, 4, 0))
                return BlockedFrames(x)
            return finish(rows_a), finish(rows_t)

        ring = jax.tree.leaves(d.observation)[0]  # [size_T, B, F]
        # Per-row gather (~73 GB/s on v5e, descriptor-bound on 8 KB
        # rows — measured faster than a vmapped U-row dynamic_slice,
        # which XLA lowers far worse despite fewer descriptors).
        fr = ring[rows_u, b2]                      # [batch, U, F] gather

        def stack(start, mask):
            win = jax.lax.slice_in_dim(fr, start, start + K, axis=1)
            win = win * mask[:, :, None].astype(win.dtype)
            # [K, Hb, Wb, ss, batch] BATCH-MINOR, materialized in uint8
            # behind an optimization barrier.  XLA:TPU's conv emitters
            # want batch in the minor dim at this batch size; without
            # the barrier, layout assignment folds the transpose into
            # the convert fusion's row-major output and re-inserts a
            # bf16 relayout copy per stream (2x ~0.45 ms/update at
            # B=1024, profiles/flagship_profile_B1024.json top_ops
            # copy.170/172).  Pinning the uint8 transpose here pays the
            # relayout at HALF the bytes and lets the mask multiply
            # fuse into it; the uint8->bf16 convert + 1/255 scale then
            # fuse into the first conv's input (models/conv.py
            # BatchMinorConv).  The model's first layer is a 3D conv
            # over (K, Hb, Wb), so the K frames never interleave into
            # one channel axis.
            win = win.reshape(batch, K, Hb, Wb, ss)
            win = jax.lax.optimization_barrier(win.transpose(1, 2, 3, 4, 0))
            return BlockedFrames(win)
        return stack(0, mask_a), stack(n, mask_t)


class UniformFrameReplayBuffer(FrameReplayMixin, UniformReplayBuffer):
    """(rlpyt/replays/non_sequence/frame.py:UniformReplayFrameBuffer)."""


class PrioritizedFrameReplayBuffer(FrameReplayMixin, PrioritizedReplayBuffer):
    """(rlpyt/replays/non_sequence/frame.py:PrioritizedReplayFrameBuffer)."""
