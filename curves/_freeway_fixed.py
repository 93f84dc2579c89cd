"""Freeway reruns on the reference-exact env (round-5 semantics fix in
envs/minatar.py:Freeway — chicken every 3 frames, cars every period+1,
x=0 spawns).  All freeway curves recorded before this fix ran a harder
game; these regenerate the headline rows and re-test the best ablation
knobs on the corrected dynamics.

Usage: python curves/_freeway_fixed.py [--only SUBSTR]
"""
from __future__ import annotations

import json
import os
import sys
import time
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
OUT = os.path.join(ROOT, "curves")

from rlpyt_tpu.utils.profiling import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

# (name, config_key, log_dir, seed, overrides)
JOBS = [
    ("ernbw_s0", "ernbw", "minatar_freeway_ernbw", 0, {}),
    ("ernbw_s1", "ernbw", "minatar_freeway_ernbw", 1, {}),
    ("dqn_s0", "dqn", "minatar_freeway_dqn", 0, {}),
    ("dqn_s1", "dqn", "minatar_freeway_dqn", 1, {}),
    ("nodouble_s0", "dqn", "freeway_ablation/fixed_nodouble", 0,
     {"algo": {"double_dqn": False}}),
    ("vecspread_s0", "dqn", "freeway_ablation/fixed_vecspread", 0,
     {"algo": {"double_dqn": False},
      "agent": {"eps_final": 0.4, "eps_final_min": 0.0016}}),
    ("pub_s0", "dqn_pub", "minatar_freeway_dqn_pub", 0, {}),
]


def main():
    from rlpyt_tpu.experiments.scripts.minatar_dqn import build_and_train

    only = sys.argv[sys.argv.index("--only") + 1] \
        if "--only" in sys.argv else None
    status_path = os.path.join(OUT, "freeway_ablation",
                               "fixed_status.json")
    status = (json.load(open(status_path))
              if os.path.exists(status_path) else {})
    for name, key, sub, seed, spec in JOBS:
        if only and only not in name:
            continue
        if status.get(name, {}).get("ok"):
            continue
        overrides = {"env": {"game": "freeway"},
                     "eval_env": {"game": "freeway"},
                     "agent": spec.get("agent", {}),
                     "algo": spec.get("algo", {}),
                     "runner": {"n_steps": 5_000_000}}
        t0 = time.time()
        print(f"=== freeway fixed-env {name} ===", flush=True)
        try:
            build_and_train(key, log_dir=os.path.join(OUT, sub),
                            run_id=seed, seed=seed,
                            config_overrides=overrides)
            status[name] = {"ok": True, "seconds": time.time() - t0,
                            "base": key, "seed": seed, "delta": spec,
                            "env": "fixed (round-5 reference-exact)"}
        except Exception as e:
            traceback.print_exc()
            status[name] = {"ok": False, "error": repr(e),
                            "seconds": time.time() - t0}
        os.makedirs(os.path.dirname(status_path), exist_ok=True)
        with open(status_path, "w") as f:
            json.dump(status, f, indent=1, default=str)
        print(f"=== {name} done in {time.time()-t0:.0f}s ===", flush=True)


if __name__ == "__main__":
    main()
