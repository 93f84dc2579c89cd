"""Frame-stack window gather via Element-indexed BlockSpecs (TPU Pallas).

The round-5 successor to ops/pallas/frame_gather.py.  That kernel's
manual HBM window DMAs (``make_async_copy`` on a dynamically sliced HBM
ref) are rejected by this toolchain's AOT compile helper at every ref
rank (measured again 2026-08-22: HTTP 500 at pipeline depths 2/8/16).
What IS Mosaic-legal here is letting the *pipeline* issue the window
DMA: an input ``BlockSpec`` with per-dimension ``pl.Element`` indexing
whose index_map reads scalar-prefetched sample indices.  Each grid step
then moves one sample's whole union window [t-K+1, t+n] as ONE
contiguous HBM→VMEM copy, with Mosaic's usual cross-step double
buffering — no per-row descriptors, no hand-rolled semaphores.

Requirements (asserted):
- the frame ring is LANE-MAJOR: ``[B, size_T + U - 1, F]`` with the
  last U-1 rows mirroring rows [0, U-1) (ghost rows), so a window never
  wraps and is contiguous per lane;
- ``F`` (the pre-blocked row length, ops/pallas/frame_gather.py:
  block_frame_rows) is a multiple of 128 so rows retile to
  ``[SB, 128]`` lanes exactly (Nature-CNN 104x80 s2d-4: F = 8320 = 65
  lanes of 128).

The kernel also applies the per-frame stack-boundary masks (rlpyt
frame.py's invalid-stack zeroing) in-kernel (a scalar-predicate
select; Mosaic has no i8 vector multiply, and 2-D SMEM mask prefetch
arrays overflow the 1 MB SMEM budget, hence the bit-packed masks), so
the separate XLA mask pass (~8% of the flagship update) disappears on
this path.

STATUS — integrated, correct, and MEASURED SLOWER at the flagship
geometry (2026-08-22, v5e): the pure Element-window COPY beats XLA's
per-row gather standalone (1.37x: 54.7 vs 39.8 GB/s, ring
[512, 390, 8320] u8, batch 1024, U=7, matched conditions), but THIS
kernel's masked dual-output form costs 8.1 ms vs the XLA
gather+slices' 1.5 ms at the exact program shapes (U=5), and the full
flagship program runs 12.9k vs 39.7k env-steps/s at B=512 — the
per-step select/dual-output codegen, not the DMA, dominates.  A
single-output copy-only retest (mask left to XLA) was blocked this
session by the AOT compile helper degrading to ~75 s per Mosaic
compile; the harness to rerun it is bench_gather_formulations.py.
The flag therefore DEFAULTS OFF and the XLA blocked-row gather ships
(replay/frame.py:_obs_pair_blocked).

Reference analogue: rlpyt/replays/frame.py reconstructs stacks with
numpy fancy indexing on the host; there is no reference kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(st_ref, bi_ref, mask_a_ref, mask_t_ref, win_ref,
            out_a_ref, out_t_ref, *, K, n_step):
    """win_ref: [1, U, SB, 128] u8 (this sample's union window, staged
    by the pipeline); outputs [K, SB, 128] u8, masked."""
    i = pl.program_id(0)
    zero = jnp.zeros_like(out_a_ref[0])
    bits_a = mask_a_ref[i]
    bits_t = mask_t_ref[i]
    for k in range(K):
        # Mosaic has no i8 vector multiply; a scalar-predicate select
        # lowers cleanly.  Masks arrive BIT-PACKED one int32 per sample
        # (bit k = frame k valid): 2-D SMEM prefetch arrays pad each
        # row to a full lane and blow the 1 MB SMEM budget at
        # batch>=1024 (measured: 1.01M/1.00M).
        out_a_ref[k] = jnp.where((bits_a >> k) & 1 != 0,
                                 win_ref[0, k], zero)
        out_t_ref[k] = jnp.where((bits_t >> k) & 1 != 0,
                                 win_ref[0, n_step + k], zero)


@functools.partial(
    jax.jit, static_argnames=("K", "n_step", "interpret"))
def gather_stacks_window(ring_lm, start_rows, b_idx, mask_a, mask_t, *,
                         K: int, n_step: int, interpret: bool = False):
    """Build masked agent/target frame stacks from a lane-major ring.

    ring_lm:    [B, size_T + U - 1, F] uint8, pre-blocked rows, ghost
                rows at the tail (U = K + n_step).
    start_rows: [batch] int32 — (t_idx - (K-1)) mod size_T.
    b_idx:      [batch] int32 — lane per sample.
    mask_a/t:   [batch, K] {0,1} validity, oldest frame first
                (bit-packed to one int32 per sample internally).
    Returns (rows_a, rows_t): [batch, K, F] uint8, already masked.
    """
    U = K + n_step
    B, NT, F = ring_lm.shape
    assert F % 128 == 0, (
        f"window kernel needs lane-aligned rows, F={F}")
    SB = F // 128
    batch = start_rows.shape[0]
    ring4 = ring_lm.reshape(B, NT, SB, 128)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,   # start_rows, b_idx, mask_a, mask_t
        grid=(batch,),
        in_specs=[pl.BlockSpec(
            (pl.Element(1), pl.Element(U), pl.Element(SB),
             pl.Element(128)),
            lambda i, st, bi, ma, mt: (bi[i], st[i], 0, 0),
        )],
        out_specs=[
            pl.BlockSpec(
                (pl.Squeezed(), pl.Blocked(K), pl.Blocked(SB),
                 pl.Blocked(128)),
                lambda i, st, bi, ma, mt: (i, 0, 0, 0)),
            pl.BlockSpec(
                (pl.Squeezed(), pl.Blocked(K), pl.Blocked(SB),
                 pl.Blocked(128)),
                lambda i, st, bi, ma, mt: (i, 0, 0, 0)),
        ],
    )
    out_shape = jax.ShapeDtypeStruct((batch, K, SB, 128), jnp.uint8)

    def pack(mask):   # [batch, K] {0,1} -> [batch] int32 bitmask
        weights = (1 << jnp.arange(K, dtype=jnp.int32))[None, :]
        return jnp.sum(mask.astype(jnp.int32) * weights, axis=1)

    rows_a, rows_t = pl.pallas_call(
        functools.partial(_kernel, K=K, n_step=n_step),
        out_shape=(out_shape, out_shape),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=batch * 2 * K * F,
            bytes_accessed=batch * (U + 2 * K) * F,
            transcendentals=0,
        ),
    )(start_rows.astype(jnp.int32), b_idx.astype(jnp.int32),
      pack(mask_a), pack(mask_t), ring4)
    return (rows_a.reshape(batch, K, F), rows_t.reshape(batch, K, F))


def lane_major_ring(size_T: int, B: int, F: int, U: int,
                    dtype=jnp.uint8):
    """Allocate the [B, size_T + U - 1, F] ghost-row ring."""
    return jnp.zeros((B, size_T + U - 1, F), dtype)


def lane_major_append(ring_lm, block_TBF, t, *, size_T: int, U: int):
    """Write a [T, B, F] block at cursor ``t`` (aligned, no wrap) and
    mirror rows [0, U-1) into the ghost tail when the block covers them.
    ``T >= U - 1`` is required so the mirror is a slice of this block
    (asserted by the caller: sample_T >= frames+n-1 always holds for
    the flagship configs; a general wrap-split would need two writes).
    """
    blk = jnp.transpose(block_TBF, (1, 0, 2))       # [B, T, F]
    ring_lm = jax.lax.dynamic_update_slice(ring_lm, blk, (0, t, 0))

    def mirror(r):
        ghost = jax.lax.dynamic_slice_in_dim(blk, 0, U - 1, axis=1)
        return jax.lax.dynamic_update_slice(r, ghost, (0, size_T, 0))

    return jax.lax.cond(t == 0, mirror, lambda r: r, ring_lm)
