"""MinAtar DQN-family configs (reference config-dict schema:
rlpyt/experiments/configs/atari/dqn/atari_dqn.py → configs["dqn"],
["ernbw"], ["r2d1"] — same section keys: agent / model / algo / env /
runner / sampler).

The "ernbw" key is the reference's Rainbow-minus-noisy combo
(Categorical + Double + Dueling + PER + n-step); "r2d1" the recurrent
prioritized-sequence config.
"""
import copy

MINATAR_MODEL = dict(channels=(16,), kernel_sizes=(3,), strides=(1,),
                     paddings=(0,), fc_sizes=(128,), obs_divisor=1.0)

configs = {}

config = dict(
    agent=dict(eps_steps=100_000, eps_final=0.1, eval_eps=0.001),
    model=dict(**MINATAR_MODEL, dueling=False),
    algo=dict(
        discount=0.99,
        batch_size=128,
        min_steps_learn=5_000,
        delta_clip=1.0,
        replay_size=500_000,
        replay_ratio=4.0,
        target_update_interval=500,
        n_step_return=3,
        learning_rate=3e-4,
        double_dqn=True,
        prioritized_replay=False,
    ),
    env=dict(game="breakout", sticky_action_prob=0.1, ramping=True),
    eval_env=dict(game="breakout", sticky_action_prob=0.1, ramping=True),
    runner=dict(n_steps=2_000_000, log_interval_steps=100_000),
    # eval caps: eval_T = eval_max_steps // eval_n_envs = 3000 per env
    # covers freeway's fixed 2500-step episodes; the while_loop eval
    # (samplers/rollout.py:evaluate) stops early at the traj cap.
    sampler=dict(batch_T=32, batch_B=64, max_decorrelation_steps=100,
                 eval_n_envs=32, eval_max_steps=96_000,
                 eval_max_trajectories=100),
)
configs["dqn"] = config

# Published MinAtar-DQN settings (Young & Tian arXiv:1903.03176 §4:
# centered RMSprop lr 2.5e-4 / decay 0.95 / eps 0.01, batch 32, uniform
# 100k replay, one batch-32 update per env step, target refresh 1k
# updates, n-step 1, eps 1->0.1 over 100k frames, learn after 5k) — the
# control variant for per-game band checks (VERDICT r3 item #1: our
# ernbw combo plateaus below the published Freeway band).
config = copy.deepcopy(config)
config["algo"].update(
    batch_size=32, replay_size=100_000,
    # replay_ratio=32 <=> one batch-32 update per env step
    # (updates_per_optimize = ratio * T*B / batch_size).
    replay_ratio=32.0,
    target_update_interval=1_000, n_step_return=1, learning_rate=2.5e-4,
    double_dqn=False, prioritized_replay=False,
    optim="rmsprop", optim_kwargs=dict(decay=0.95, eps=0.01,
                                       centered=True))
configs["dqn_pub"] = config

config = copy.deepcopy(configs["dqn"])
config["model"]["dueling"] = True
config["algo"].update(prioritized_replay=True, pri_alpha=0.5,
                      pri_beta=0.4)
config["agent"].update(n_atoms=51, v_min=-10.0, v_max=10.0)
configs["ernbw"] = config

# ernbw + Ape-X per-lane ε spread (eps_final_min: log-spaced final ε
# across the batch lanes, agents/dqn.py:EpsilonGreedyMixin).  Measured
# at the 5M budget to improve 4 of 5 MinAtar games over scalar ε and
# never hurt beyond noise (curves/README.md "Vector-ε spread
# generalization"); kept as a separate key so "ernbw" stays
# reference-parity scalar-ε.
config = copy.deepcopy(configs["ernbw"])
config["agent"].update(eps_final_min=0.0016, eps_final=0.4)
configs["ernbw_vec"] = config

config = copy.deepcopy(configs["dqn"])
config["model"] = dict(**MINATAR_MODEL)
config["model"]["lstm_size"] = 128
del config["model"]["fc_sizes"]
config["agent"] = dict(eps_steps=100_000, eps_final=0.1,
                       eps_final_min=0.0005, lstm_size=128)
config["algo"] = dict(
    discount=0.997, batch_b=32, batch_T=40, warmup_T=20,
    min_steps_learn=5_000, replay_size=500_000,
    # lr 3e-4 / ratio 2 measured clearly better than rlpyt's Atari-scale
    # 1e-4 / 1 at MinAtar's reward scale (flat vs 2x improvement at 1M)
    replay_ratio=2.0,
    target_update_interval=1_000, n_step_return=5, learning_rate=3e-4,
    double_dqn=True, prioritized_replay=True, pri_alpha=0.6,
    pri_beta=0.9, pri_eta=0.9, input_priorities=True)
# Reference-default parity note: rlpyt's R2D1 masks the loss after the
# first done in each window (valid_from_done); ours trains all steps by
# default because LstmCore resets carry at dones and the n-step return
# stops at the first done (documented deviation, algos/r2d1.py:71).
# For a strict-parity run add: config["algo"]["mask_after_done"] = True.
# sampler batch_T must be a multiple of the sequence-replay rnn-state
# store interval (= warmup_T, replay/sequence.py:70); rlpyt's R2D1
# sampler used batch_T=40 for the same reason (store-state stride 40).
config["sampler"] = dict(batch_T=40, batch_B=64,
                         max_decorrelation_steps=100,
                         eval_n_envs=32, eval_max_steps=96_000,
                         eval_max_trajectories=100)
configs["r2d1"] = config
