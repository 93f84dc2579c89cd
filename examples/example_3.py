"""Example 3: PPO on MinAtar Breakout with 128 vectorized envs
(reference: rlpyt examples/example_3.py — parallel-CPU A2C; vector
parallelism here is the vmapped env batch under one jit)."""
from rlpyt_tpu.experiments.scripts.minatar_pg import build_and_train


if __name__ == "__main__":
    build_and_train(
        "ppo",
        config_overrides=dict(
            runner=dict(n_steps=2_000_000, log_interval_steps=100_000)),
    )
