"""Worker process for tests/test_multihost.py — one simulated host.

Each OS process joins a 2-process jax.distributed group over localhost
(the CPU stand-in for one TPU host of a pod slice; reference:
rlpyt/runners/sync_rl.py ~L100 torch.distributed.init_process_group),
forces 2 local CPU devices, builds the GLOBAL 4-device dp mesh, and runs
a short SyncRl DQN/CartPole training with env/replay lanes dp-sharded
across both processes.  It prints a digest of the final (replicated)
params so the parent can assert both hosts ended bitwise-identical, plus
this host's ``host_env_slice`` so the per-host env-lane split is covered.

Run as:  python _multihost_worker.py <coordinator> <num_procs> <proc_id>
"""
import os
import sys

# Must be set before jax import: each "host" owns 2 local CPU devices.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2")

import jax  # noqa: E402
import numpy as np  # noqa: E402

# Images that ship a TPU plugin pin the platform; the config update is
# authoritative where the env var alone is not (see tests/conftest.py).
jax.config.update("jax_platforms", "cpu")


def main(coordinator: str, num_processes: int, process_id: int) -> None:
    from rlpyt_tpu.parallel.mesh import (
        MeshSpec, host_env_slice, init_distributed)

    rank = init_distributed(coordinator_address=coordinator,
                            num_processes=num_processes,
                            process_id=process_id)
    assert rank == process_id
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == 2 * num_processes and n_local == 2, (
        n_global, n_local)

    from rlpyt_tpu.agents.dqn import DqnAgent
    from rlpyt_tpu.algos.dqn import DQN
    from rlpyt_tpu.envs.classic import CartPole
    from rlpyt_tpu.models.dqn import DqnMlpModel
    from rlpyt_tpu.runners.sync import SyncRl
    from rlpyt_tpu.samplers.rollout import BatchSpec

    B = 16
    agent = DqnAgent(ModelCls=DqnMlpModel,
                     model_kwargs=dict(hidden_sizes=(32, 32)),
                     eps_steps=2_000, eps_final=0.1)
    algo = DQN(batch_size=32, min_steps_learn=128, replay_size=4_096,
               replay_ratio=2.0, target_update_interval=50,
               learning_rate=1e-3)
    runner = SyncRl(algo=algo, agent=agent, env=CartPole(),
                    batch_spec=BatchSpec(T=16, B=B), n_steps=1_024,
                    seed=7, log_interval_steps=512,
                    max_decorrelation_steps=0,
                    mesh=MeshSpec(dp=n_global))
    carry = runner.train()

    # Env lanes actually sharded across BOTH processes.
    obs = carry.rollout_state.observation
    assert not obs.sharding.is_fully_replicated
    assert len(obs.sharding.device_set) == n_global

    # Params replicated -> fully addressable on every host.
    leaves = jax.tree.leaves(carry.train_state.params)
    assert all(l.sharding.is_fully_replicated for l in leaves)
    digest = float(sum(np.abs(np.asarray(l)).sum() for l in leaves))

    sl = host_env_slice(B)
    per = B // num_processes
    assert sl == slice(process_id * per, (process_id + 1) * per)

    print(f"MULTIHOST_OK rank={rank} digest={digest:.10e} "
          f"slice={sl.start}:{sl.stop} cum={int(carry.rollout_state.cum_steps)}",
          flush=True)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
