"""Freeway per-setting ablations (VERDICT r3 item #1).

Context: our ernbw/dqn configs plateau at 26-29 on MinAtar Freeway at 5M
steps vs the published DQN band (~50-60, Young & Tian arXiv:1903.03176),
and the faithful published-settings variant (configs minatar_dqn.py:
"dqn_pub" — centered RMSprop 2.5e-4, batch 32, one update per env step,
uniform 100k replay, n-step 1, no double) collapses to 0.0 return in our
64-lane lockstep regime (curves/minatar_freeway_dqn_pub).  These runs
flip ONE knob at a time from the working "dqn" control toward the
published settings (plus an env sticky-action control) to isolate which
setting carries the gap.

Each run: Freeway, 5M steps, seed 0, logs to
curves/freeway_ablation/<name>/run_0/progress.csv; summary appended to
curves/freeway_ablation/status.json.
"""
from __future__ import annotations

import json
import os
import sys
import time
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
OUT = os.path.join(ROOT, "curves", "freeway_ablation")

from rlpyt_tpu.utils.profiling import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

ABLATIONS = {
    # one published setting at a time, applied to the working control
    "n_step_1": {"algo": {"n_step_return": 1}},
    "replay_100k": {"algo": {"replay_size": 100_000}},
    "batch32_ratio32": {"algo": {"batch_size": 32, "replay_ratio": 32.0}},
    "rmsprop": {"algo": {"learning_rate": 2.5e-4, "optim": "rmsprop",
                         "optim_kwargs": {"decay": 0.95, "eps": 0.01,
                                          "centered": True}}},
    "no_double": {"algo": {"double_dqn": False}},
    # rescue test: published combo + the two knobs we suspect carry it
    "pub_rescued": {"config_key": "dqn_pub",
                    "algo": {"n_step_return": 3,
                             "replay_size": 500_000}},
    # env control: published numbers predate sticky actions
    "no_sticky": {"env": {"sticky_action_prob": 0.0},
                  "eval_env": {"sticky_action_prob": 0.0}},
    # --- wave 2 (informed by wave 1: n-step helps, double hurts,
    # RMSprop-eps-0.01 freezes, ratio-32-on-frozen-replay collapses) ---
    # eps completes the RMSprop story: is it the optimizer or its eps?
    "rmsprop_eps1e8": {"algo": {"learning_rate": 2.5e-4,
                                "optim": "rmsprop",
                                "optim_kwargs": {"decay": 0.95,
                                                 "eps": 1e-8,
                                                 "centered": True}}},
    # moderate update-to-data increase (paper is 32; control is 4)
    "ratio8": {"algo": {"replay_ratio": 8.0}},
    # best-of-wave-1 combos pushing toward the published band
    "nodouble_n5": {"algo": {"double_dqn": False, "n_step_return": 5}},
    "nodouble_ratio8": {"algo": {"double_dqn": False,
                                 "replay_ratio": 8.0}},
    # --- wave 3: interleave granularity.  The published recipe updates
    # after EVERY env step; our fused design updates in blocks of
    # T*B env steps on a frozen replay (2048 at the default B=64 —
    # where the published batch32/ratio32 collapsed to 1.5).  B=8
    # shrinks the block to 256 steps; the "pub32" variant then carries
    # the full published update budget at that granularity.
    "lanes8": {"sampler": {"batch_B": 8}},
    "lanes8_pub32": {"sampler": {"batch_B": 8},
                     "algo": {"batch_size": 32, "replay_ratio": 32.0}},
    # --- wave 4 (VERDICT r4 item #1): the exploration-geometry
    # hypothesis named by waves 1-3's README — 64 lockstep lanes anneal
    # ε within ~1,562 steps/lane, under one 2,500-step Freeway episode,
    # so every lane leaves its random-exploration phase before finishing
    # a single episode.  All on the wave-1 best base (no_double, 33.5).
    # (a) stretch the anneal across many episodes per lane
    "eps1m": {"algo": {"double_dqn": False},
              "agent": {"eps_steps": 1_000_000}},
    "eps3m": {"algo": {"double_dqn": False},
              "agent": {"eps_steps": 3_000_000}},
    # (b) lower the post-anneal floor after the long anneal
    "eps1m_f05": {"algo": {"double_dqn": False},
                  "agent": {"eps_steps": 1_000_000, "eps_final": 0.05}},
    "eps1m_f01": {"algo": {"double_dqn": False},
                  "agent": {"eps_steps": 1_000_000, "eps_final": 0.01}},
    # (c) vector-ε spread (Ape-X/R2D1 geometry, already implemented for
    # R2D1 via eps_final_min): per-lane finals log-spaced 0.4..0.0016
    "vecspread": {"algo": {"double_dqn": False},
                  "agent": {"eps_final": 0.4, "eps_final_min": 0.0016}},
    "vecspread_mild": {"algo": {"double_dqn": False},
                       "agent": {"eps_final": 0.1,
                                 "eps_final_min": 0.001}},
    # (d) phase-decorrelate lanes across Freeway's fixed 2,500-step
    # episodes (control: decorrelation alone, no ε change)
    "decor2500": {"algo": {"double_dqn": False},
                  "sampler": {"max_decorrelation_steps": 2_500}},
    # --- wave 5: combinations of the wave-4 winners (each bought
    # +2-6 alone: eps1m_f01 39.3, vecspread 40.0 vs no_double 33.5),
    # plus the one geometry never tested — the published recipe at its
    # OWN serial geometry (batch_B=1, 1 update per env step), which is
    # the exact cadence Young & Tian ran; every prior "pub" variant ran
    # it on 8-64 lockstep lanes.
    "combo_v": {"algo": {"double_dqn": False},
                "agent": {"eps_steps": 3_000_000, "eps_final": 0.4,
                          "eps_final_min": 0.0016},
                "sampler": {"max_decorrelation_steps": 2_500}},
    "combo_vn": {"algo": {"double_dqn": False, "n_step_return": 5},
                 "agent": {"eps_steps": 3_000_000, "eps_final": 0.4,
                           "eps_final_min": 0.0016},
                 "sampler": {"max_decorrelation_steps": 2_500}},
    "lanes1_pub32": {"config_key": "dqn_pub",
                     "sampler": {"batch_B": 1, "eval_n_envs": 8,
                                 "eval_max_steps": 24_000}},
}


def main():
    from rlpyt_tpu.experiments.scripts.minatar_dqn import build_and_train

    only = sys.argv[1] if len(sys.argv) > 1 else None
    os.makedirs(OUT, exist_ok=True)
    status_path = os.path.join(OUT, "status.json")
    status = (json.load(open(status_path))
              if os.path.exists(status_path) else {})
    for name, spec in ABLATIONS.items():
        if only and only not in name:
            continue
        if status.get(name, {}).get("ok"):
            continue
        key = spec.get("config_key", "dqn")
        overrides = {"env": {"game": "freeway",
                             **spec.get("env", {})},
                     "eval_env": {"game": "freeway",
                                  **spec.get("eval_env", {})},
                     "agent": spec.get("agent", {}),
                     "algo": spec.get("algo", {}),
                     "sampler": spec.get("sampler", {}),
                     "runner": {"n_steps": 5_000_000}}
        t0 = time.time()
        print(f"=== freeway ablation {name} (base {key}) ===", flush=True)
        try:
            build_and_train(key, log_dir=os.path.join(OUT, name),
                            run_id=0, seed=0, config_overrides=overrides)
            status[name] = {"ok": True, "seconds": time.time() - t0,
                            "base": key, "delta": spec}
        except Exception as e:
            traceback.print_exc()
            status[name] = {"ok": False, "error": repr(e),
                            "seconds": time.time() - t0}
        with open(status_path, "w") as f:
            json.dump(status, f, indent=1, default=str)
        print(f"=== {name} done in {time.time()-t0:.0f}s ===", flush=True)


if __name__ == "__main__":
    main()
