"""MinAtar policy-gradient configs (reference schema:
rlpyt/experiments/configs/atari/pg/atari_ff_a2c.py, atari_lstm_a2c.py)."""
import copy

from rlpyt_tpu.experiments.configs.minatar_dqn import MINATAR_MODEL

configs = {}

config = dict(
    agent=dict(),
    model=dict(**MINATAR_MODEL),
    algo=dict(
        discount=0.99,
        learning_rate=3e-4,
        value_loss_coeff=0.5,
        entropy_loss_coeff=0.01,
        clip_grad_norm=1.0,
        gae_lambda=0.95,
        normalize_advantage=False,
    ),
    env=dict(game="breakout", sticky_action_prob=0.1, ramping=True),
    eval_env=dict(game="breakout", sticky_action_prob=0.1, ramping=True),
    runner=dict(n_steps=5_000_000, log_interval_steps=100_000),
    sampler=dict(batch_T=16, batch_B=128, max_decorrelation_steps=100,
                 eval_n_envs=32, eval_max_steps=96_000,
                 eval_max_trajectories=100),
)
configs["a2c"] = config

config = copy.deepcopy(config)
config["algo"].update(
    epochs=4, minibatches=4, ratio_clip=0.1, linear_lr_schedule=True,
    learning_rate=2.5e-4, gae_lambda=0.95, normalize_advantage=True)
configs["ppo"] = config

# Recurrent PG (reference config family:
# rlpyt/experiments/configs/atari/pg/atari_lstm_a2c.py — Atari LSTM A2C
# is a first-class config there; this is its MinAtar-scale analogue).
config = copy.deepcopy(configs["a2c"])
config["model"]["lstm_size"] = 128
configs["lstm_a2c"] = config

config = copy.deepcopy(configs["ppo"])
config["model"]["lstm_size"] = 128
# recurrent PPO minibatches over B only (init_rnn_state per lane)
configs["lstm_ppo"] = config
