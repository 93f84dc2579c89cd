"""On-device AsyncRl vs MinibatchRl throughput (VERDICT r4 item #6).

The reference's flagship topology is the asynchronous actor-learner
(rlpyt/runners/async_rl.py ~L20-400: sampler / memory-copier /
optimizer processes with a replay-ratio throttle).  Our on-device
analogue (runners/async_rl.py:AsyncRl) fuses those roles into one
program and keeps ``pipeline_depth`` interval programs in flight so
host-side logging/blocking overlaps device compute.  The host-farm
comparison was measured in round 4 (sync 246 / async 197 / alternating
238 steps/s on the 2-core MuJoCo host, curves/mujoco_1m); this bench
completes the disposition with the DEVICE-side number on the flagship
Nature-CNN geometry.

Steady-state env-steps/s is computed from the runner's own progress.csv
(steps between interval 3 and the last, over the CumTime delta), so
compile/trace time of the first intervals is excluded for both runners
identically.

Usage: python bench_async.py [--B 128] [--T 32] [--smoke]
Prints one JSON line per configuration + a summary line.
"""
from __future__ import annotations

import argparse
import csv
import json
import os
import shutil


def steady_sps(csv_path, skip: int = 2):
    rows = list(csv.DictReader(open(csv_path)))
    rows = [r for r in rows if r.get("CumTime (s)")]
    assert len(rows) > skip + 1, f"too few intervals in {csv_path}"
    a, b = rows[skip], rows[-1]
    steps = float(b["CumSteps"]) - float(a["CumSteps"])
    dt = float(b["CumTime (s)"]) - float(a["CumTime (s)"])
    return steps / dt


def run_one(name, B, T, ub, rr, n_intervals, RunnerCls, **kw):
    import jax

    from bench_atari import build_runner
    from rlpyt_tpu.utils.logging import TabularLogger

    log_dir = f"/tmp/bench_async/{name}"
    shutil.rmtree(log_dir, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)
    # snapshot_mode="none": at this bench's per-interval log cadence,
    # MinibatchRl's params.pkl pickling would dominate the measurement
    # (first run showed 3.8k vs 30k steps/s — all snapshot I/O, not
    # pipelining).  Both runners get the same no-snapshot logger; the
    # comparison then isolates the pipelined dispatch itself.
    logger = TabularLogger(log_dir, snapshot_mode="none")
    runner = build_runner(B=B, T=T, update_batch=ub, replay_ratio=rr,
                          RunnerCls=RunnerCls, n_intervals=n_intervals,
                          logger=logger, **kw)
    runner.train()
    sps = steady_sps(os.path.join(log_dir, "progress.csv"))
    return round(sps, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=128)
    ap.add_argument("--T", type=int, default=32)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    import jax

    from rlpyt_tpu.utils.profiling import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        args.B, args.T = 8, 8

    from rlpyt_tpu.runners.async_rl import AsyncRl
    from rlpyt_tpu.runners.train import MinibatchRl

    B, T = args.B, args.T
    ub, rr = 2 * B, 8.0
    n_int = 4 if args.smoke else 40
    rs = 4_000 if args.smoke else 200_000

    out = {"geometry": {"B": B, "T": T, "update_batch": ub,
                        "replay_ratio": rr}}
    out["minibatch_sps"] = run_one(
        "minibatch", B, T, ub, rr, n_int, MinibatchRl, replay_size=rs)
    for depth in (2, 4):
        out[f"async_d{depth}_sps"] = run_one(
            f"async_d{depth}", B, T, ub, rr, n_int, AsyncRl,
            replay_size=rs, pipeline_depth=depth, checkpoint_every=0)
    # Replay-ratio throttle (the reference's updates_per_sync bound):
    # halve the update budget explicitly and show the rate responds.
    import math
    base_updates = None
    out["async_d2_throttled_sps"] = run_one(
        "async_throttle", B, T, ub, rr, n_int, AsyncRl,
        replay_size=rs, pipeline_depth=2, checkpoint_every=0,
        updates_per_interval=max(1, int(rr * T * B / ub) // 2))
    out["async_over_minibatch"] = round(
        out["async_d2_sps"] / out["minibatch_sps"], 4)
    out["device"] = str(jax.devices()[0].device_kind)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
