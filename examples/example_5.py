"""Example 5: asynchronous-mode training with checkpointing (reference:
rlpyt examples/example_5.py — async DQN/R2D1 with sampler/optimizer
processes; here AsyncRl pipelines interval programs and throttles the
update rate explicitly)."""
import tempfile

from rlpyt_tpu.agents.dqn import R2d1Agent
from rlpyt_tpu.algos.r2d1 import R2D1
from rlpyt_tpu.envs.minatar import Breakout
from rlpyt_tpu.models.dqn import AtariR2d1Model
from rlpyt_tpu.runners.async_rl import AsyncRl
from rlpyt_tpu.samplers.rollout import BatchSpec


def build_and_train(n_steps=1_000_000, seed=0):
    agent = R2d1Agent(
        ModelCls=AtariR2d1Model,
        model_kwargs=dict(channels=(16,), kernel_sizes=(3,), strides=(1,),
                          paddings=(0,), obs_divisor=1.0, lstm_size=128),
        lstm_size=128, eps_steps=100_000, eps_final=0.1)
    algo = R2D1(discount=0.997, batch_b=32, batch_T=40, warmup_T=20,
                min_steps_learn=5_000, replay_size=200_000,
                replay_ratio=1.0, target_update_interval=1_000,
                n_step_return=5, learning_rate=1e-4)
    ckpt = tempfile.mkdtemp(prefix="rlpyt_tpu_ck_")
    runner = AsyncRl(algo=algo, agent=agent, env=Breakout(),
                     batch_spec=BatchSpec(T=40, B=32), n_steps=n_steps,
                     seed=seed, log_interval_steps=50_000,
                     updates_per_interval=None, pipeline_depth=2,
                     checkpoint_dir=ckpt)
    carry = runner.train()
    print(f"checkpoint (full carry, deterministic resume): {ckpt}")
    return runner, carry


if __name__ == "__main__":
    build_and_train()
