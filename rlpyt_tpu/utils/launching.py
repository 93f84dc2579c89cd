"""Local experiment launcher (reference:
rlpyt/utils/launching/exp_launcher.py:run_experiments, launch_experiment
~L15-200).

Spawns ``python script <log_dir> <run_ID> *args`` per (variant, run),
queuing launches over a fixed number of concurrent slots — the
reference's run-slot scheduler with the affinity-code argv replaced by
an optional per-slot environment (e.g. pinning each slot to a TPU
device subset via JAX flags).
"""
from __future__ import annotations

import os
import subprocess
import sys
import time
from typing import Dict, List, Optional, Sequence

from rlpyt_tpu.utils.variant import save_variant


def launch_experiment(script: str, log_dir: str, run_id: int,
                      args: Sequence[str] = (),
                      env: Optional[Dict[str, str]] = None):
    """(rlpyt exp_launcher.launch_experiment): one subprocess run."""
    os.makedirs(log_dir, exist_ok=True)
    cmd = [sys.executable, script, log_dir, str(run_id), *map(str, args)]
    full_env = dict(os.environ)
    if env:
        full_env.update(env)
    out = open(os.path.join(log_dir, f"stdout_{run_id}.log"), "w")
    return subprocess.Popen(cmd, stdout=out, stderr=subprocess.STDOUT,
                            env=full_env)


def run_experiments(script: str, experiment_title: str,
                    variants: List[dict], log_dirs: List[str],
                    runs_per_setting: int = 1,
                    common_args: Sequence[str] = (),
                    n_slots: int = 1,
                    root_log_dir: str = "data",
                    slot_envs: Optional[List[Dict[str, str]]] = None,
                    poll_s: float = 2.0):
    """(rlpyt exp_launcher.run_experiments): queue the full variant x
    run grid over ``n_slots`` concurrent subprocesses."""
    launches = []
    for variant, vdir in zip(variants, log_dirs):
        for run_id in range(runs_per_setting):
            log_dir = os.path.join(root_log_dir, experiment_title, vdir)
            save_variant(variant, log_dir)
            launches.append((log_dir, run_id))

    procs: List[Optional[subprocess.Popen]] = [None] * n_slots
    results = []
    i = 0
    while i < len(launches) or any(p is not None for p in procs):
        for slot in range(n_slots):
            p = procs[slot]
            if p is not None and p.poll() is not None:
                results.append(p.returncode)
                procs[slot] = None
            if procs[slot] is None and i < len(launches):
                log_dir, run_id = launches[i]
                env = slot_envs[slot] if slot_envs else None
                procs[slot] = launch_experiment(
                    script, log_dir, run_id, common_args, env)
                i += 1
        time.sleep(poll_s)
    return results
