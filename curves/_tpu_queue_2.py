"""Serialized TPU job chain #2 (one chip; jobs strictly sequential):
flagship update-time ledger profile, R2D1 deconflation ablations, the
on-device async-runner bench, then MuJoCo 1M seeds."""
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(args, name):
    r = subprocess.run([sys.executable] + args, cwd=ROOT)
    print(f"=== queue2: {name} exit {r.returncode} ===", flush=True)


def main():
    run(["bench_profile.py", "--B", "1024"], "profile B1024")
    run([os.path.join("curves", "run_r2d1_ablations.py")],
        "r2d1 ablations")
    run(["bench_async.py", "--B", "128"], "bench_async B128")
    run([os.path.join("curves", "run_mujoco_1m.py"),
         "--only", "HalfCheetah-v5_sac_seed1", "--seeds", "1"],
        "mujoco HC sac seed1")
    run([os.path.join("curves", "run_mujoco_1m.py"),
         "--only", "HalfCheetah-v5_sac_seed2", "--seeds", "2"],
        "mujoco HC sac seed2")


if __name__ == "__main__":
    main()
