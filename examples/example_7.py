"""Example 7: host-environment training (reference: rlpyt
examples/example_7.py — alternating sampler; the host farm + device
action-server is this framework's analogue, with JAX async dispatch
providing the compute/simulate overlap).

Runs gymnasium MuJoCo HalfCheetah SAC over the shared-memory env farm.
"""
from rlpyt_tpu.agents.qpg import SacAgent
from rlpyt_tpu.algos.qpg import SAC
from rlpyt_tpu.envs.host import SharedMemVecEnv
from rlpyt_tpu.runners.host import HostMinibatchRl


def build_and_train(n_steps=1_000_000, seed=0, n_envs=16, n_workers=8):
    farm = SharedMemVecEnv(["HalfCheetah-v5"] * n_envs,
                           n_workers=n_workers, seed=seed)
    agent = SacAgent()
    algo = SAC(batch_size=256, min_steps_learn=10_000,
               replay_size=1_000_000, replay_ratio=1.0,
               learning_rate=3e-4, target_update_tau=0.005)
    runner = HostMinibatchRl(algo=algo, agent=agent, vec_env=farm,
                             batch_T=32, n_steps=n_steps, seed=seed,
                             log_interval_steps=10_000)
    result = runner.train()
    farm.close()
    return result


if __name__ == "__main__":
    build_and_train()
