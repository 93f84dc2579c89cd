"""Worker process for tests/test_multihost.py::test_host_farm_feeds_global_mesh
— one simulated host that OWNS A HOST-ENV FARM SLICE.

This is the topology SURVEY.md §5.8 maps rlpyt's multi-GPU + CPU-worker
stack onto (reference: rlpyt/samplers/parallel/base.py n_envs_list env
split across workers + rlpyt/runners/sync_rl.py torch.distributed
learners): each process runs a ``SharedMemVecEnv`` of CartPole envs for
its ``host_env_slice`` of the global lane batch, steps it with local
batched inference, contributes its [T, B_local] slice of the global
dp-sharded sample batch via ``jax.make_array_from_process_local_data``,
and executes ONE global jitted DQN optimize over the multi-process mesh
(GSPMD all-reduces the gradients; the dp-sharded replay ring spans both
hosts' lanes).

Prints a params digest + its lane slice so the parent asserts both
hosts ended bitwise-identical and the farm slices cover the batch.

Run as: python _multihost_farm_worker.py <coordinator> <num_procs> <id>
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

jax.config.update("jax_platforms", "cpu")

T = 16          # batch_T
B_GLOBAL = 8    # global env lanes across all hosts
N_ITRS = 8


def main(coordinator: str, num_processes: int, process_id: int) -> None:
    from rlpyt_tpu.parallel.mesh import (
        MeshSpec, carry_sharding, host_env_slice, init_distributed,
        put_global)

    rank = init_distributed(coordinator_address=coordinator,
                            num_processes=num_processes,
                            process_id=process_id)
    n_global = len(jax.devices())
    mesh = MeshSpec(dp=n_global).make()

    from rlpyt_tpu.agents.base import StepCtx
    from rlpyt_tpu.agents.dqn import DqnAgent
    from rlpyt_tpu.algos.dqn import DQN
    from rlpyt_tpu.envs.host import GymEnv, SharedMemVecEnv
    from rlpyt_tpu.models.dqn import DqnMlpModel
    from rlpyt_tpu.runners.host import HostRolloutState
    from rlpyt_tpu.runners.train import TrainCarry
    from rlpyt_tpu.samplers.rollout import BatchSpec, Samples

    # --- this host's farm slice (rlpyt n_envs_list split) -------------
    sl = host_env_slice(B_GLOBAL)
    lanes = list(range(B_GLOBAL))[sl]
    B_local = len(lanes)
    farm = SharedMemVecEnv(
        [lambda: GymEnv("CartPole-v1") for _ in lanes],
        n_workers=2, seed=100 + sl.start)  # per-lane seeds disjoint
    obs_local = np.asarray(farm.reset())

    # --- global carry, identical on every process (same seed) ---------
    agent = DqnAgent(ModelCls=DqnMlpModel,
                     model_kwargs=dict(hidden_sizes=(32, 32)),
                     eps_steps=1_000, eps_final=0.1)
    agent.initialize(farm.spaces)
    algo = DQN(batch_size=32, min_steps_learn=64, replay_size=2_048,
               replay_ratio=2.0, target_update_interval=50,
               learning_rate=1e-3)
    key = jax.random.key(11)
    obs_example = jnp.zeros((B_GLOBAL,) + obs_local.shape[1:],
                            obs_local.dtype)
    train_state, replay_state = algo.initialize(
        agent, BatchSpec(T, B_GLOBAL), obs_example, key, n_itr=N_ITRS)

    carry = TrainCarry(
        rollout_state=HostRolloutState(
            observation=obs_example,
            prev_action=jnp.zeros((B_GLOBAL,), jnp.int32),
            prev_reward=jnp.zeros((B_GLOBAL,), jnp.float32),
            agent_carry=None,
            cum_steps=jnp.zeros((), jnp.int32)),
        train_state=train_state, replay_state=replay_state,
        algo_key=jax.random.key(12))
    shardings = carry_sharding(mesh, carry, B_GLOBAL)
    carry = put_global(carry, shardings)

    # --- local inference fn (batched over this host's lanes) ----------
    @jax.jit
    def local_step(host_params, k, obs, prev_a, prev_r, cum):
        ctx = StepCtx(cum_steps=cum, is_eval=False)
        astep, _ = agent.step(host_params, k, obs, prev_a, prev_r,
                              None, ctx)
        return astep.action

    global_opt = jax.jit(algo.optimize, donate_argnums=(0, 1))

    def batch_sh(ndim):
        spec = [None, "dp"] + [None] * (ndim - 2)
        return NamedSharding(mesh, P(*spec))

    def to_global(local_tb):
        """[T, B_local] numpy → global dp-sharded [T, B_GLOBAL]."""
        arr = np.asarray(local_tb)
        return jax.make_array_from_process_local_data(
            batch_sh(arr.ndim), arr)

    prev_a = np.zeros((B_local,), np.int64)
    prev_r = np.zeros((B_local,), np.float32)
    k_act = jax.random.key(1000 + rank)
    cum = 0
    for itr in range(N_ITRS):
        # every host needs identical params for identical actions ⇒
        # read the replicated global params to host memory.
        host_params = jax.device_get(carry.train_state.params)
        rec = {k: [] for k in
               ("obs", "act", "rew", "done", "to", "pa", "pr")}
        for t in range(T):
            k_act, k = jax.random.split(k_act)
            act = np.asarray(local_step(
                host_params, k, jnp.asarray(obs_local),
                jnp.asarray(prev_a), jnp.asarray(prev_r),
                jnp.asarray(cum + t * B_GLOBAL, jnp.int32)))
            rec["obs"].append(obs_local.copy())
            rec["pa"].append(prev_a.copy())
            rec["pr"].append(prev_r.copy())
            obs_local, rew, done, to = farm.step(act)
            obs_local = np.asarray(obs_local)
            rec["act"].append(act)
            rec["rew"].append(np.asarray(rew, np.float32))
            rec["done"].append(np.asarray(done))
            rec["to"].append(np.asarray(to))
            prev_a = np.where(done, 0, act)
            prev_r = np.where(done, 0.0, rew).astype(np.float32)
        cum += T * B_GLOBAL

        samples = Samples(
            observation=to_global(np.stack(rec["obs"])),
            action=to_global(np.stack(rec["act"])),
            reward=to_global(np.stack(rec["rew"])),
            done=to_global(np.stack(rec["done"])),
            prev_action=to_global(np.stack(rec["pa"])),
            prev_reward=to_global(np.stack(rec["pr"])),
            agent_info={},
            env_info={"timeout": to_global(np.stack(rec["to"]))},
        )
        ro = carry.rollout_state._replace(
            cum_steps=jnp.asarray(cum, jnp.int32))
        carry_key, k_opt = jax.random.split(carry.algo_key)
        ts, rs, opt_info = global_opt(
            carry.train_state, carry.replay_state, samples, k_opt, ro)
        carry = carry._replace(train_state=ts, replay_state=rs,
                               algo_key=carry_key, rollout_state=ro)

    leaves = jax.tree.leaves(carry.train_state.params)
    assert all(l.sharding.is_fully_replicated for l in leaves)
    # The dp-sharded replay ring spans both hosts' lane groups.
    r_leaves = [l for l in jax.tree.leaves(carry.replay_state)
                if hasattr(l, "sharding") and l.ndim >= 2
                and l.shape[1] == B_GLOBAL]
    assert r_leaves and all(
        len(l.sharding.device_set) == n_global for l in r_leaves)
    digest = float(sum(np.abs(np.asarray(l)).sum() for l in leaves))
    updates = int(carry.train_state.update_counter)
    farm.close()
    print(f"FARMHOST_OK rank={rank} digest={digest:.10e} "
          f"slice={sl.start}:{sl.stop} updates={updates}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
