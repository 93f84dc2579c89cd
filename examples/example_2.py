"""Example 2: Atari-class DQN on the on-device MinAtar Breakout path
(reference: rlpyt examples/example_2.py — GPU-sampler Atari DQN; here
the "GPU sampler" is simply the fused on-device rollout)."""
from rlpyt_tpu.experiments.scripts.minatar_dqn import build_and_train


if __name__ == "__main__":
    build_and_train(
        "dqn",
        config_overrides=dict(
            runner=dict(n_steps=500_000, log_interval_steps=50_000)),
    )
