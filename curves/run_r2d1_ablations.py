"""R2D1 quality ablations at a separating budget (VERDICT r3 item #6).

The committed R2D1 MinAtar curves sit ~3x below the feed-forward ernbw
combo at equal steps (breakout 4.8 vs 14.6); prior ablations ran at 1M
where nothing separates.  These run at 5M on breakout — past the point
where the curves have diverged — one knob per run:

- zero_state: stored-state vs zero-state sequence init (burn-in from
  zeros; R2D2-paper baseline).
- eta_05:     priority mixture eta 0.9 -> 0.5 (max-vs-mean TD mix).
- lr_1e4:     learning rate 3e-4 -> 1e-4 (rlpyt's Atari-scale value).
- target_2500: target refresh 1k -> 2.5k updates (rlpyt default).

Writes curves/r2d1_ablation/<name>/run_0/progress.csv + status.json.
"""
from __future__ import annotations

import json
import os
import sys
import time
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
OUT = os.path.join(ROOT, "curves", "r2d1_ablation")

from rlpyt_tpu.utils.profiling import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

ABLATIONS = {
    "zero_state": {"algo": {"zero_state_init": True}},
    "eta_05": {"algo": {"pri_eta": 0.5}},
    "lr_1e4": {"algo": {"learning_rate": 1e-4}},
    "target_2500": {"algo": {"target_update_interval": 2_500}},
    # --- round 5 (VERDICT r4 item #5): deconflate recurrence from head
    # capacity / target transform in the 16.4-vs-3.7 ernbw-vs-r2d1 gap.
    # Note the r2d1 model head is ALREADY dueling (models/dqn.py
    # AtariR2d1Model dueling=True default), so the missing controls are
    # on the other axes:
    # (a) ernbw minus C51 = plain dueling Double-DQN + PER, ff — what
    #     does the distributional head buy the ff combo?
    "ernbw_noc51": {"config_key": "dqn",
                    "model": {"dueling": True},
                    "algo": {"prioritized_replay": True,
                             "pri_alpha": 0.5, "pri_beta": 0.4}},
    # (b) value rescaling off: h/h⁻¹ compress MinAtar-scale values
    #     (h(1)=0.415) — is the transform costing the recurrent combo?
    "norescale": {"algo": {"use_value_rescale": False}},
    # (c) Atari-scale discount 0.997 -> the ff combo's 0.99
    "disc099": {"algo": {"discount": 0.99}},
    # (d) reverse head control: r2d1 without dueling
    "nodueling": {"model": {"dueling": False}},
}

N_STEPS = 5_000_000


def main():
    from rlpyt_tpu.experiments.scripts.minatar_dqn import build_and_train

    only = sys.argv[1] if len(sys.argv) > 1 else None
    os.makedirs(OUT, exist_ok=True)
    status_path = os.path.join(OUT, "status.json")
    status = (json.load(open(status_path))
              if os.path.exists(status_path) else {})
    # baseline slot: unmodified r2d1 at the same 5M budget for an
    # apples-to-apples column (the committed curve runs 10M).
    jobs = {"baseline_5m": {}, **ABLATIONS}
    for name, spec in jobs.items():
        if only and only not in name:
            continue
        if status.get(name, {}).get("ok"):
            continue
        overrides = {"env": {"game": "breakout"},
                     "eval_env": {"game": "breakout"},
                     "model": spec.get("model", {}),
                     "algo": spec.get("algo", {}),
                     "runner": {"n_steps": N_STEPS}}
        key = spec.get("config_key", "r2d1")
        t0 = time.time()
        print(f"=== r2d1 ablation {name} (base {key}) ===", flush=True)
        try:
            build_and_train(key, log_dir=os.path.join(OUT, name),
                            run_id=0, seed=0, config_overrides=overrides)
            status[name] = {"ok": True, "seconds": time.time() - t0,
                            "delta": spec}
        except Exception as e:
            traceback.print_exc()
            status[name] = {"ok": False, "error": repr(e),
                            "seconds": time.time() - t0}
        with open(status_path, "w") as f:
            json.dump(status, f, indent=1, default=str)
        print(f"=== {name} done in {time.time()-t0:.0f}s ===", flush=True)


if __name__ == "__main__":
    main()
