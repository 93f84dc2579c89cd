"""End-to-end Atari-path training through the host farm with the
FakeALE backend: the full config -> script -> farm -> device pipeline
(reference flow: rlpyt/experiments/scripts/atari/dqn/train/atari_dqn.py
+ examples/example_1.py, with the emulator faked).  Asserts the rlpyt
TrajInfo column parity (GameScore, DiscountedReturn) and that DQN
learns the scripted game's reward action."""
import csv
import os

import numpy as np
import pytest

from rlpyt_tpu.experiments.scripts.atari_dqn import build_and_train

TINY = dict(
    model=dict(channels=(8,), kernel_sizes=(8,), strides=(8,),
               paddings=(0,), fc_sizes=(64,)),
    agent=dict(eps_steps=2_500, eps_final=0.02),
    algo=dict(min_steps_learn=500, replay_size=20_000, batch_size=32,
              replay_ratio=8.0, learning_rate=1e-3,
              target_update_interval=100, frame_buffer=True),
    env=dict(fake=True, repeat_action_probability=0.0,
             max_start_noops=4),
    eval_env=dict(fake=True, repeat_action_probability=0.0,
                  max_start_noops=4, episodic_lives=False,
                  clip_reward=True),
    runner=dict(n_steps=7_000, log_interval_steps=1_750),
    sampler=dict(batch_T=16, batch_B=8, eval_n_envs=4,
                 eval_max_steps=400, eval_max_trajectories=20),
)


@pytest.mark.slow
def test_atari_dqn_fake_ale_learns(tmp_path):
    runner, _ = build_and_train(
        "dqn", log_dir=str(tmp_path), run_id=0, seed=3,
        config_overrides=TINY, serial=True)

    csv_path = os.path.join(str(tmp_path), "run_0", "progress.csv")
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    assert rows, "no progress rows logged"
    cols = set(rows[0])
    # rlpyt TrajInfo key parity (samplers/collections.py:TrajInfo ~L60
    # + envs/atari/atari_env.py:AtariTrajInfo GameScore).
    for k in ("ReturnAverage", "LengthAverage", "NonzeroRewardsAverage",
              "DiscountedReturnAverage", "GameScoreAverage",
              "EvalReturnAverage", "EvalGameScoreAverage", "CumSteps",
              "StepsPerSecond"):
        assert k in cols, f"missing column {k}"

    # Learning: the scripted game pays for holding action 1; random play
    # scores ~3 per game, optimal ~9+ clipped (~12+ raw GameScore).
    last = rows[-1]
    assert float(last["ReturnAverage"]) > 5.0, rows[-1]
    assert float(last["GameScoreAverage"]) > 6.0, rows[-1]
    # DiscountedReturn < Return (discount 0.99 over ~27-step games).
    assert (float(last["DiscountedReturnAverage"])
            < float(last["ReturnAverage"]))
