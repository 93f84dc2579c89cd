"""Throughput smoke: HalfCheetah SAC on the CPU backend (no TPU).

Measures whether the host-farm matrix can run off-chip: the TPU path is
bound at ~246 steps/s by the per-step tunneled-device round trip, so a
CPU learner may match it while freeing the chip for other runs.
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    from curves.run_mujoco_1m import run_one
    t0 = time.time()
    run_one("sac", "HalfCheetah-v5", n_steps, seed=9, runner="sync",
            log_dir="/tmp/mujoco_cpu_smoke")
    dt = time.time() - t0
    print(f"CPU_SMOKE {n_steps} steps in {dt:.1f}s = "
          f"{n_steps/dt:.1f} steps/s", flush=True)


if __name__ == "__main__":
    main()
