"""Example 1: serial-parity DQN on CartPole — the smoke entry point
(reference: rlpyt examples/example_1.py, which runs serial DQN Pong).

Runs in under a minute on CPU; demonstrates the minimum wiring:
env + agent + algo + runner.
"""
from rlpyt_tpu.agents.dqn import DqnAgent
from rlpyt_tpu.algos.dqn import DQN
from rlpyt_tpu.envs.classic import CartPole
from rlpyt_tpu.models.dqn import DqnMlpModel
from rlpyt_tpu.runners.train import MinibatchRl
from rlpyt_tpu.samplers.rollout import BatchSpec


def build_and_train(n_steps=200_000, seed=0, log_dir=None, run_id=0):
    env = CartPole()
    agent = DqnAgent(
        ModelCls=DqnMlpModel,
        model_kwargs=dict(hidden_sizes=(256, 256)),
        eps_steps=50_000,
        eps_final=0.02,
    )
    algo = DQN(
        discount=0.99,
        batch_size=128,
        min_steps_learn=1_000,
        replay_size=50_000,
        replay_ratio=8.0,
        target_update_interval=300,
        learning_rate=1e-3,
        double_dqn=True,
        n_step_return=1,
    )
    runner = MinibatchRl(
        algo=algo,
        agent=agent,
        env=env,
        batch_spec=BatchSpec(T=32, B=16),
        n_steps=n_steps,
        seed=seed,
        log_interval_steps=20_000,
    )
    carry = runner.train()
    return runner, carry


if __name__ == "__main__":
    build_and_train()
