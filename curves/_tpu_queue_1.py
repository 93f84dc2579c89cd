"""Serialized TPU job chain #1 (one chip — never two TPU jobs at once):
R2D1 deconflation ablations, then MuJoCo HalfCheetah SAC 1M seed 1."""
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    r = subprocess.run([sys.executable,
                        os.path.join(ROOT, "curves",
                                     "run_r2d1_ablations.py")])
    print("r2d1 ablations exit", r.returncode, flush=True)
    r = subprocess.run([sys.executable,
                        os.path.join(ROOT, "curves", "run_mujoco_1m.py"),
                        "--only", "HalfCheetah-v5_sac_seed1",
                        "--seeds", "1"])
    print("mujoco seed1 exit", r.returncode, flush=True)


if __name__ == "__main__":
    main()
