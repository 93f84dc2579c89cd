"""Example 9: PPO on real MuJoCo over the host bridge, with offline
evaluation (reference: rlpyt examples/example_2.py GPU-sampler eval
topology + experiments/scripts/mujoco/pg/train/mujoco_ff_ppo.py).

Gymnasium MuJoCo envs step in a shared-memory worker farm; the Gaussian
actor-critic runs batched on device (the action-server pattern), and a
separate eval farm runs greedy episodes at each log interval.
"""
from rlpyt_tpu.experiments.scripts.mujoco_pg import build_and_train


if __name__ == "__main__":
    build_and_train(
        "ppo",
        config_overrides=dict(
            env=dict(id="HalfCheetah-v5"),
            eval_env=dict(id="HalfCheetah-v5"),
            sampler=dict(eval_n_envs=8, eval_max_steps=10_000,
                         eval_max_trajectories=10),
        ),
    )
