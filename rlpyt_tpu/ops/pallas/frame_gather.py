"""Fused frame-stack gather kernel (TPU Pallas).

The frame-compressed replay's sample path is the flagship DQN program's
top cost: reconstructing two K-frame stacks (agent + target) per sampled
transition from single-frame ring rows.  In pure XLA this lowers to a
row gather, boundary-mask selects, a stack concatenate, a uint8→bf16
convert, and the model's space-to-depth relayout — ~6-10 ms of the
~17 ms update at B=4096 on v5e (profiles/flagship_profile_B2048.json),
all bandwidth-bound data movement over the same bytes.

This kernel does the whole pipeline in ONE pass per sample:

    HBM ring row window --DMA--> VMEM --mask·convert·block--> conv input

- The ring carries ``K-1+n`` ghost rows mirroring its first rows, so
  every sample's union window [t-K+1, t+n] is one CONTIGUOUS (strided
  over the lane axis) slice: one DMA per sample instead of K+n row
  gathers (the XLA gather ran at ~70 GB/s, descriptor-bound on 8 KB
  rows).
- Boundary masking arrives as a precomputed [batch, K] 0/1 vector per
  stack (index math on the done ring — bytes, not frames) and is a
  VPU multiply in VMEM.
- Output is the space-to-depth conv input [batch, H/s, W/s, K·s·s]
  bfloat16 with channel order (k, dy, dx) — exactly the layout
  models/conv.py:Conv2dModel produces for its raw path, so the SAME
  conv params serve both the rollout (raw obs) and update (blocked)
  paths.

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
    """Marker pytree: observation already in space-to-depth conv layout
    [..., H/s, W/s, K*s*s].  Models that support it skip their own
    input relayout (models/dqn.py:AtariDqnModel)."""

    data: jax.Array


def _kernel(rows_ref, bidx_ref, mask_a_ref, mask_t_ref, ring_ref,
            out_a_ref, out_t_ref, buf, sems, *, U, K, n_step, H, W, s,
            out_dtype):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    Hb, Wb = H // s, W // s

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
        win = frames[start:start + K]         # [K, F] static slice
        x = win.astype(out_dtype) * mask_ref[0].astype(out_dtype)[:, None]
        # [K, H, W] -> [K, Hb, s, Wb, s] -> [Hb, Wb, K, s, s] (k,dy,dx)
        x = x.reshape(K, Hb, s, Wb, s)
        x = x.transpose(1, 3, 0, 2, 4)
        out_ref[0] = x.reshape(Hb, Wb, K * s * s)

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

    ring:        [size_T + K-1+n_step, B, H*W] uint8 — frame rows with
                 ghost rows mirroring rows [0, K-1+n_step).
    start_rows:  [batch] int32 — (t_idx - (K-1)) mod size_T.
    b_idx:       [batch] int32 — lane index per sample.
    mask_a/t:    [batch, K] {0,1} — stack-boundary validity (oldest
                 frame first), from the done ring.
    Returns (agent, target): each [batch, H/s, W/s, K*s*s] out_dtype,
    unscaled (fold 1/255 into the conv input, models/conv.py).
    """
    batch = start_rows.shape[0]
    U = K + n_step
    F = H * W
    assert ring.ndim == 3 and ring.shape[2] == F, ring.shape
    Hb, Wb = H // s, W // s
    C = K * s * s
    out_shape = jax.ShapeDtypeStruct((batch, Hb, Wb, C), out_dtype)

    kern = functools.partial(_kernel, U=U, K=K, n_step=n_step, H=H, W=W,
                             s=s, out_dtype=out_dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,            # start_rows, b_idx
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, K), lambda i, rows, bidx: (i, 0),
                         memory_space=pltpu.VMEM),     # mask_a
            pl.BlockSpec((1, K), lambda i, rows, bidx: (i, 0),
                         memory_space=pltpu.VMEM),     # mask_t
            pl.BlockSpec(memory_space=pl.ANY),          # ring (HBM)
        ],
        out_specs=[
            pl.BlockSpec((1, Hb, Wb, C),
                         lambda i, rows, bidx: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hb, Wb, C),
                         lambda i, rows, bidx: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, U, F), ring.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_a, out_t = pl.pallas_call(
        kern,
        out_shape=(out_shape, out_shape),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=batch * 2 * K * F,
            bytes_accessed=batch * (U * F + 4 * Hb * Wb * C),
            transcendentals=0,
        ),
    )(start_rows.astype(jnp.int32), b_idx.astype(jnp.int32),
      mask_a.astype(jnp.uint8), mask_t.astype(jnp.uint8), ring)
    return out_a, out_t


def gather_frame_stacks_reference(ring_plain, start_rows, b_idx, mask_a,
                                  mask_t, *, K, n_step, H, W, s,
                                  out_dtype=jnp.bfloat16):
    """Pure-jnp reference (no ghost rows: ring_plain is [size_T, B, F]
    and rows wrap mod size_T).  Used by tests to pin the kernel."""
    size_T = ring_plain.shape[0]
    U = K + n_step
    rows = (start_rows[:, None] + jnp.arange(U)[None, :]) % size_T
    fr = ring_plain[rows, b_idx[:, None]]      # [batch, U, F]
    outs = []
    for start, mask in ((0, mask_a), (n_step, mask_t)):
        win = fr[:, start:start + K].astype(out_dtype)
        win = win * mask.astype(out_dtype)[:, :, None]
        x = win.reshape(-1, K, H // s, s, W // s, s)
        x = x.transpose(0, 2, 4, 1, 3, 5)
        outs.append(x.reshape(-1, H // s, W // s, K * s * s))
    return tuple(outs)
