"""Does the Ape-X vector-ε spread that helped Freeway generalize?

On the fixed Freeway env, per-lane log-spaced final ε (0.4 → 0.0016,
`eps_final_min`, agents/dqn.py) bought +4 over the no_double control
(57.4 vs 53.3 online).  VERDICT r4 item #9 asks whether the same
exploration-geometry knob moves the other four games — Seaquest in
particular sat at the low end of its published band (11.2-11.9 vs
~10-20).  This driver reruns ernbw + vecspread on the other games at
the matched 5M budget, seed 0, writing beside the committed baseline
curves for a README table.

Usage: python curves/_vecspread_games.py [--only SUBSTR]
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

GAMES = ("seaquest", "breakout", "space_invaders", "asterix")
SPREAD = {"eps_final": 0.4, "eps_final_min": 0.0016}


def main():
    from rlpyt_tpu.experiments.scripts.minatar_dqn import build_and_train

    only = sys.argv[sys.argv.index("--only") + 1] \
        if "--only" in sys.argv else None
    status_path = os.path.join(OUT, "vecspread_status.json")
    status = (json.load(open(status_path))
              if os.path.exists(status_path) else {})
    for game in GAMES:
        name = f"{game}_ernbw_vecspread"
        if only and only not in name:
            continue
        if status.get(name, {}).get("ok"):
            continue
        overrides = {"env": {"game": game}, "eval_env": {"game": game},
                     "agent": dict(SPREAD),
                     "runner": {"n_steps": 5_000_000}}
        t0 = time.time()
        print(f"=== {name} ===", flush=True)
        try:
            build_and_train(
                "ernbw",
                log_dir=os.path.join(OUT, f"minatar_{game}_ernbw_vecspread"),
                run_id=0, seed=0, config_overrides=overrides)
            status[name] = {"ok": True,
                            "seconds": round(time.time() - t0, 1)}
        except Exception as e:
            traceback.print_exc()
            status[name] = {"ok": False, "error": repr(e),
                            "seconds": round(time.time() - t0, 1)}
        with open(status_path, "w") as f:
            json.dump(status, f, indent=1)
        print(f"=== {name} done in {time.time()-t0:.0f}s ===", flush=True)


if __name__ == "__main__":
    main()
