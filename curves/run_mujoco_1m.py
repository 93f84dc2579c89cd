"""MuJoCo curves at rlpyt's full 1M-step validation budget, through the
async actor/learner machinery (VERDICT r3 item #3).

Two parts:

1. ``--compare``: a controlled sync vs async vs alternating wall-clock
   measurement (HalfCheetah SAC, 100k steps, nothing else on the chip),
   recorded to curves/mujoco_1m/sync_vs_async.json and BASELINE.md.
   Measured on the 2-core host: sync 246 steps/s, async 197 (the
   actor-on-CPU thread contends with the farm workers for cores),
   alternating 238 steady-state — the overlap machinery needs spare
   host cores to win, which this host does not have.
2. The 1M curve matrix: HalfCheetah-v5 / Walker2d-v5 x SAC / TD3.
   Because sync measured fastest here, matrix runs default to the sync
   farm; at ~246 steps/s a 1M run is ~68 min, so the committed matrix
   carries what chip time allowed (status.json records each run).

Usage:
  python curves/run_mujoco_1m.py --compare
  python curves/run_mujoco_1m.py [--only SUBSTR] [--seeds 0,1]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
OUT = os.path.join(ROOT, "curves", "mujoco_1m")

from rlpyt_tpu.utils.profiling import enable_persistent_compilation_cache

enable_persistent_compilation_cache()


def run_one(config_key, env_id, n_steps, seed, runner, log_dir):
    from rlpyt_tpu.experiments.scripts.mujoco_qpg import build_and_train
    overrides = {
        "env": {"id": env_id}, "eval_env": {"id": env_id},
        "runner": {"n_steps": n_steps, "log_interval_steps": 20_000},
        "sampler": {"n_workers": 2},
    }
    t0 = time.time()
    kw = {}
    if runner == "alt":
        kw = dict(runner="sync", alternating=True)
    else:
        kw = dict(runner=runner)
    build_and_train(config_key, log_dir=log_dir, run_id=seed, seed=seed,
                    config_overrides=overrides, **kw)
    return time.time() - t0


def compare(n_steps=100_000):
    os.makedirs(OUT, exist_ok=True)
    out = {}
    for runner in ("sync", "async", "alt"):
        dt = run_one("sac", "HalfCheetah-v5", n_steps, seed=0,
                     runner=runner,
                     log_dir=os.path.join(OUT, f"_compare_{runner}"))
        out[runner] = {"seconds": round(dt, 1),
                       "steps_per_s": round(n_steps / dt, 1)}
        print(json.dumps({runner: out[runner]}), flush=True)
    out["speedup_async"] = round(out["sync"]["seconds"]
                                 / out["async"]["seconds"], 3)
    out["speedup_alt"] = round(out["sync"]["seconds"]
                               / out["alt"]["seconds"], 3)
    out["n_steps"] = n_steps
    with open(os.path.join(OUT, "sync_vs_async.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


def matrix(only=None, seeds=(0, 1), n_steps=1_000_000):
    os.makedirs(OUT, exist_ok=True)
    status_path = os.path.join(OUT, "status.json")
    status = (json.load(open(status_path))
              if os.path.exists(status_path) else {})
    for env_id in ("HalfCheetah-v5", "Walker2d-v5"):
        for key in ("sac", "td3"):
            for seed in seeds:
                name = f"{env_id}_{key}_seed{seed}"
                if only and only not in name:
                    continue
                if status.get(name, {}).get("ok"):
                    continue
                print(f"=== {name} (sync, {n_steps}) ===", flush=True)
                t0 = time.time()
                try:
                    dt = run_one(key, env_id, n_steps, seed, "sync",
                                 os.path.join(OUT, f"{env_id}_{key}"))
                    status[name] = {"ok": True, "seconds": round(dt, 1),
                                    "runner": "sync",
                                    "n_steps": n_steps}
                except Exception as e:
                    traceback.print_exc()
                    status[name] = {"ok": False, "error": repr(e),
                                    "seconds": round(time.time() - t0, 1)}
                with open(status_path, "w") as f:
                    json.dump(status, f, indent=1)
                print(f"=== {name} done in {time.time()-t0:.0f}s ===",
                      flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--compare", action="store_true")
    ap.add_argument("--only", default=None)
    ap.add_argument("--seeds", default="0,1")
    ap.add_argument("--n-steps", type=int, default=1_000_000)
    args = ap.parse_args()
    if args.compare:
        compare()
    else:
        matrix(args.only, tuple(int(s) for s in args.seeds.split(",")),
               args.n_steps)
