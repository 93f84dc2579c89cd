"""Fused frame-stack gather kernel (TPU Pallas) — EXPERIMENTAL, does
NOT ship.

On real v5e hardware Mosaic rejects the kernel's single-lane row slices
(HBM tiling rules), so the production path is the blocked-row XLA gather
in replay/frame.py (``_obs_pair_blocked``), which reuses this module's
``block_frame_rows`` insert-time layout and ``BlockedFrames`` container.
The kernel itself runs only in interpret mode (tests) and is kept as the
starting point for a lane-padded Mosaic-legal variant.

The frame-compressed replay's sample path is the flagship DQN program's
top cost: reconstructing two K-frame stacks (agent + target) per sampled
transition from single-frame ring rows.  In pure XLA this lowers to a
row gather, boundary-mask selects, a stack concatenate, a uint8→bf16
convert, and the model's space-to-depth relayout — ~6-10 ms of the
~17 ms update at B=4096 on v5e (profiles/flagship_profile_B2048.json),
all bandwidth-bound data movement over the same bytes.

Design: the expensive interleave (space-to-depth blocking) moves to
INSERT time — each collected frame is stored as a pre-blocked row
(``block_frame_rows``), paid once per env step instead of ~2x
replay_ratio times per sampled frame.  Sampling is then one kernel:

    HBM ring window --one strided DMA--> VMEM --mask·convert--> conv input

- The ring carries ``K-1+n`` ghost rows mirroring its first rows, so
  every sample's union window [t-K+1, t+n] is one CONTIGUOUS (strided
  over lanes) slice: one DMA per sample instead of K+n row gathers
  (the XLA gather ran at ~70 GB/s, descriptor-bound on 8 KB rows).
- Boundary masking arrives as a [batch, K] 0/1 scalar-prefetch vector
  per stack (index math on the done ring) and is a VPU scalar multiply.
- Output channels assemble as (k, dy, dx) — exactly the layout
  models/conv.py:Conv2dModel produces for its raw space-to-depth path,
  so the SAME conv params serve the rollout (raw obs) and update
  (blocked) paths.

Reference analogue: rlpyt/replays/frame.py reconstructs stacks with
numpy fancy indexing on the host; there is no reference kernel — this
is the TPU-native replacement for that memory path.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class BlockedFrames(NamedTuple):
    """Marker pytree: observation already in the BATCH-MINOR
    space-to-depth conv layout [K, H/s, W/s, s*s, N] (produced by
    replay/frame.py:_obs_pair_blocked behind an optimization barrier).
    Models that support it skip their own input relayout
    (models/dqn.py:AtariDqnModel)."""

    data: jax.Array


def block_frame_rows(frames, s: int):
    """[..., H, W] frames → [..., H/s * W/s * s*s] pre-blocked flat rows
    (order (hb, wb, dy, dx); applied once at replay insert)."""
    *lead, H, W = frames.shape
    x = frames.reshape(*lead, H // s, s, W // s, s)
    perm = tuple(range(len(lead))) + tuple(
        len(lead) + a for a in (0, 2, 1, 3))
    x = x.transpose(*perm)
    return x.reshape(*lead, (H // s) * (W // s) * s * s)


def _kernel(rows_ref, bidx_ref, mask_a_ref, mask_t_ref, ring_ref,
            out_a_ref, out_t_ref, buf, sems, *, U, K, n_step, F):
    """Masked window copy: out rows stay in the ring's pre-blocked row
    layout; everything is full-row ops (Mosaic imposes lane-tiling
    limits on sliced HBM views and in-kernel reshapes, so the
    K-interleave happens as a cheap uint8 XLA transpose outside)."""
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def dma_for(j, slot):
        return pltpu.make_async_copy(
            ring_ref.at[pl.ds(rows_ref[j], U), bidx_ref[j]],  # [U, F]
            buf.at[slot], sems.at[slot])

    @pl.when(i == 0)
    def _():
        dma_for(0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        dma_for(i + 1, (i + 1) % 2).start()

    dma_for(i, i % 2).wait()
    frames = buf[i % 2]                       # [U, F] uint8

    def build(start, mask_ref, out_ref):
        for k in range(K):
            m = mask_ref[i, k].astype(jnp.uint8)   # {0,1} scalar
            out_ref[0, k] = frames[start + k] * m

    build(0, mask_a_ref, out_a_ref)
    build(n_step, mask_t_ref, out_t_ref)


@functools.partial(
    jax.jit,
    static_argnames=("K", "n_step", "H", "W", "s", "out_dtype",
                     "interpret"))
def gather_frame_stacks(ring, start_rows, b_idx, mask_a, mask_t, *,
                        K: int, n_step: int, H: int, W: int, s: int,
                        out_dtype=jnp.bfloat16, interpret: bool = False):
    """Build the agent and target space-to-depth stacks for a batch of
    sampled transitions.

    ring:        [size_T + K-1+n_step, B, F] uint8 — PRE-BLOCKED frame
                 rows (block_frame_rows) with ghost rows mirroring rows
                 [0, K-1+n_step).
    start_rows:  [batch] int32 — (t_idx - (K-1)) mod size_T.
    b_idx:       [batch] int32 — lane index per sample.
    mask_a/t:    [batch, K] {0,1} — stack-boundary validity (oldest
                 frame first), from the done ring.
    Returns (agent, target): each [batch, K, H/s, W/s, s*s] out_dtype,
    unscaled (fold 1/255 into the conv input, models/conv.py).
    """
    batch = start_rows.shape[0]
    U = K + n_step
    Hb, Wb = H // s, W // s
    P, ss = Hb * Wb, s * s
    F = P * ss
    assert ring.ndim == 3 and ring.shape[2] == F, ring.shape
    C = K * ss
    out_shape = jax.ShapeDtypeStruct((batch, K, F), ring.dtype)

    kern = functools.partial(_kernel, U=U, K=K, n_step=n_step, F=F)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,    # start_rows, b_idx, mask_a, mask_t
        grid=(batch,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # ring (HBM)
        ],
        out_specs=[
            pl.BlockSpec((1, K, F), lambda i, *prefetch: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, F), lambda i, *prefetch: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, U, F), ring.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    rows_a, rows_t = pl.pallas_call(
        kern,
        out_shape=(out_shape, out_shape),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=batch * 2 * K * F,
            bytes_accessed=batch * (U * F + 2 * K * F),
            transcendentals=0,
        ),
    )(start_rows.astype(jnp.int32), b_idx.astype(jnp.int32),
      mask_a.astype(jnp.int32), mask_t.astype(jnp.int32), ring)

    def unflatten(rows):
        # [batch, K, F] -> [batch, K, Hb, Wb, ss]: pure reshape — the
        # model's first layer is a 3D conv over (K, Hb, Wb) so no
        # channel interleave is ever needed (models/conv.py).
        return rows.reshape(batch, K, Hb, Wb, ss).astype(out_dtype)

    return unflatten(rows_a), unflatten(rows_t)


def gather_frame_stacks_reference(ring_plain, start_rows, b_idx, mask_a,
                                  mask_t, *, K, n_step, H, W, s,
                                  out_dtype=jnp.bfloat16):
    """Pure-jnp reference on RAW [H*W] rows (no ghost rows: rows wrap
    mod size_T).  Used by tests to pin the kernel."""
    size_T = ring_plain.shape[0]
    U = K + n_step
    rows = (start_rows[:, None] + jnp.arange(U)[None, :]) % size_T
    fr = ring_plain[rows, b_idx[:, None]]      # [batch, U, F]
    outs = []
    for start, mask in ((0, mask_a), (n_step, mask_t)):
        win = fr[:, start:start + K].astype(out_dtype)
        win = win * mask.astype(out_dtype)[:, :, None]
        x = win.reshape(-1, K, H // s, s, W // s, s)
        x = x.transpose(0, 1, 2, 4, 3, 5)       # per-frame blocking
        outs.append(x.reshape(-1, K, H // s, W // s, s * s))
    return tuple(outs)
