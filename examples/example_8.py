"""Example 8: R2D1 — recurrent replay DQN on MinAtar Breakout
(reference: rlpyt examples/example_5.py r2d1 mode + experiments/scripts/
atari/dqn/train/atari_r2d1.py): LSTM Q-network, prioritized sequence
replay with burn-in and stored rnn state, value rescaling, vector-ε
exploration — all fused into one on-device rollout+learn program.
"""
from rlpyt_tpu.experiments.scripts.minatar_dqn import build_and_train


if __name__ == "__main__":
    build_and_train(
        "r2d1",
        config_overrides=dict(
            runner=dict(n_steps=2_000_000, log_interval_steps=100_000)),
    )
