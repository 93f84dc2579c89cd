"""Frame-row gather formulations microbench (replay sample path).

The flagship DQN program's top data-movement op is the replay row
gather (~18% of each update, profiles/flagship_profile_B1024.json).
This harness times the candidate formulations head-to-head at the
flagship shapes (F=8320 u8 pre-blocked rows, union U=7, batch 1024),
in-graph under a lax.scan so tunneled-dispatch latency amortizes (a
single-op wall timing through the axon tunnel is meaningless —
measured "33 TB/s" for a 1 GB copy).

Measured 2026-08-22 (v5e, ring [512 lanes, 390 rows], light
background load; rerun on an idle chip for cleaner absolutes — the
RELATIVE ordering was stable across loads):

| formulation                              | run A ms | run B ms |
|---|---|---|
| in-scan 60 MB streaming copy (calib)     | 0.549 (884 GB/s) | 1.328 (366 GB/s) |
| XLA per-row gather (ships)               | 1.498 (39.8 GB/s) | 1.963 (30.4) |
| Pallas row gather (index_map, 8 KB DMAs) | 10.52 (5.7) | 10.77 (5.5) |
| Pallas Element-WINDOW copy (58 KB DMAs)  | 1.091 (54.7) | 1.792 (33.3) |
| Pallas manual window DMA (depth 2/8/16)  | toolchain-blocked (AOT helper HTTP 500, all depths) |

Two same-day runs under different tunnel/terminal conditions (the
calib row is the tell: achievable streaming bandwidth itself swung
2.4x).  The ORDERING is stable — window > XLA >> per-row Pallas — but
the window margin moves with conditions (1.37x run A, 1.10x run B).

Readings: (1) everything is far from streaming bandwidth — the random
row/window traffic pays DRAM page misses that the calib copy does not;
(2) per-8KB-row DMAs issued one-per-grid-step are ~7x WORSE than
XLA's gather emitter — Mosaic's per-step overhead (~1.3 us) dwarfs the
79 ns transfer; (3) one contiguous window DMA per sample (lane-major
ghost ring + per-dim ``pl.Element`` indexing) is the only formulation
that beats XLA, by 1.37x; (4) hand-rolled ``make_async_copy`` window
DMAs with deeper pipelining — the obvious next step — crash this
toolchain's AOT compile helper at every depth, so the Element window's
2-deep pipelining is the ceiling here.

Integration status: ops/pallas/window_gather.py ships the Element
formulation behind ``DQN(window_gather_kernel=True)`` (default OFF:
its masked dual-output form measured slower in-program; module
docstring has the numbers).

Usage: python bench_gather_formulations.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rlpyt_tpu.utils.profiling import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

SIZE_T = 390
B_LANES = 512
F = 8320
SB = F // 128
U = 7
BATCH = 1024
N_INNER = 50
REPS = 5

key = jax.random.PRNGKey(0)
ring = jax.random.randint(key, (SIZE_T, B_LANES, F), 0, 255, jnp.uint8)
k1, k2 = jax.random.split(key)
start_t = jax.random.randint(k1, (BATCH,), 0, SIZE_T, jnp.int32)
b_idx = jax.random.randint(k2, (BATCH,), 0, B_LANES, jnp.int32)

GB = BATCH * U * F / 1e9


def timed_scan(one, ring, start_t, b_idx, name):
    @jax.jit
    def run(ring, start_t, b_idx):
        def body(acc, i):
            st = (start_t + i) % SIZE_T
            bi = (b_idx + i) % B_LANES
            out = one(ring, st, bi)
            return acc + out[0, 0, 0].astype(jnp.int32), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(N_INNER))
        return acc

    run(ring, start_t, b_idx).block_until_ready()
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        run(ring, start_t, b_idx).block_until_ready()
        ts.append(time.perf_counter() - t0)
    t = np.median(ts) / N_INNER
    print(f"{name:28s} {t*1e3:8.3f} ms/gather  {GB/t:7.1f} GB/s (read)")


def xla_row(ring, st, bi):
    rows = (st[:, None] + jnp.arange(U)[None, :]) % SIZE_T
    return ring[rows, bi[:, None]]


def _copy_kernel(st_ref, bi_ref, in_ref, out_ref):
    out_ref[...] = in_ref[...]


def pallas_row(ring, st, bi):
    ring3 = ring.reshape(SIZE_T * B_LANES, SB, 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(BATCH, U),
        in_specs=[pl.BlockSpec(
            (pl.Squeezed(), pl.Blocked(SB), pl.Blocked(128)),
            lambda i, j, stp, bip: (
                ((stp[i] + j) % SIZE_T) * B_LANES + bip[i], 0, 0),
        )],
        out_specs=pl.BlockSpec(
            (pl.Squeezed(), pl.Squeezed(), pl.Blocked(SB),
             pl.Blocked(128)),
            lambda i, j, stp, bip: (i, j, 0, 0)),
    )
    out = pl.pallas_call(
        _copy_kernel,
        out_shape=jax.ShapeDtypeStruct((BATCH, U, SB, 128), jnp.uint8),
        grid_spec=grid_spec,
    )(st, bi, ring3)
    return out.reshape(BATCH, U, F)


def _copy_kernel_sq(st_ref, bi_ref, in_ref, out_ref):
    out_ref[...] = in_ref[0]


def make_lane_major(ring):
    x = jnp.swapaxes(ring.reshape(SIZE_T, B_LANES, SB, 128), 0, 1)
    return jnp.concatenate([x, x[:, :U - 1]], axis=1)   # ghost rows


def pallas_window(ring_lm, st, bi):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(BATCH,),
        in_specs=[pl.BlockSpec(
            (pl.Element(1), pl.Element(U), pl.Element(SB),
             pl.Element(128)),
            lambda i, stp, bip: (bip[i], stp[i], 0, 0),
        )],
        out_specs=pl.BlockSpec(
            (pl.Squeezed(), pl.Blocked(U), pl.Blocked(SB),
             pl.Blocked(128)),
            lambda i, stp, bip: (i, 0, 0, 0)),
    )
    return pl.pallas_call(
        _copy_kernel_sq,
        out_shape=jax.ShapeDtypeStruct((BATCH, U, SB, 128), jnp.uint8),
        grid_spec=grid_spec,
    )(st, bi, ring_lm).reshape(BATCH, U, F)


if __name__ == "__main__":
    st0 = start_t % (SIZE_T - U)
    ref = xla_row(ring, st0, b_idx)
    ring_lm = make_lane_major(ring)
    jax.block_until_ready(ring_lm)
    print("row    match:",
          bool(jnp.array_equal(ref, pallas_row(ring, st0, b_idx))))
    print("window match:",
          bool(jnp.array_equal(ref, pallas_window(ring_lm, st0, b_idx))))

    # calibration: in-scan streaming copy of ~the same bytes
    slab = ring[:114]
    @jax.jit
    def crun(slab, s):
        def body(acc, i):
            out = slab + (s[0] + i).astype(jnp.uint8)
            return acc + out[0, 0, 0].astype(jnp.int32), None
        return jax.lax.scan(body, jnp.int32(0), jnp.arange(N_INNER))[0]
    crun(slab, start_t).block_until_ready()
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        crun(slab, start_t).block_until_ready()
        ts.append(time.perf_counter() - t0)
    t = np.median(ts) / N_INNER
    print(f"{'calib in-scan 60MB copy':28s} {t*1e3:8.3f} ms/iter    "
          f"{slab.size/1e9/t:7.1f} GB/s (read)")

    timed_scan(xla_row, ring, start_t, b_idx, "xla row gather")
    timed_scan(pallas_row, ring, start_t, b_idx, "pallas row gather")
    timed_scan(pallas_window, ring_lm, start_t, b_idx,
               "pallas window gather")
