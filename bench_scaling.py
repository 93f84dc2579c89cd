"""Data-parallel scaling-efficiency harness (BASELINE.md metric #3:
>=80% scaling 1 host -> 4 hosts; reference: rlpyt/runners/sync_rl.py's
multi-GPU replicas).

Measures steady-state env-steps/s of the fused MinAtar-Breakout DQN
program under SyncRl with a dp=N mesh, against the dp=1 MinibatchRl
program, and prints one JSON line with per-dp steps/s and scaling
efficiency  eff(N) = sps(N) / (N * sps(1)).

Run modes:
- Real hardware (a v5p/v5e slice): just `python bench_scaling.py`;
  the mesh spans all visible chips.  Multi-host: start one process per
  host with `rlpyt_tpu.parallel.mesh.init_distributed` env vars set —
  the same script works unchanged (GSPMD global mesh).
- This image (one chip): `JAX_PLATFORMS=cpu
  XLA_FLAGS=--xla_force_host_platform_device_count=8 python
  bench_scaling.py` exercises the structure on a virtual 8-device mesh.
  Virtual-device numbers share physical cores, so they validate the
  program/sharding shape, not real scaling — the harness is committed
  so a real-slice run is zero additional work.
"""
from __future__ import annotations

import argparse
import json
import time


def measure(dp: int, per_device_B: int = 256, T: int = 32,
            n_intervals: int = 8):
    import jax

    from rlpyt_tpu.agents.dqn import DqnAgent
    from rlpyt_tpu.algos.dqn import DQN
    from rlpyt_tpu.envs.minatar import Breakout
    from rlpyt_tpu.models.dqn import AtariDqnModel
    from rlpyt_tpu.parallel.mesh import MeshSpec
    from rlpyt_tpu.runners.sync import SyncRl
    from rlpyt_tpu.runners.train import MinibatchRl
    from rlpyt_tpu.samplers.rollout import BatchSpec

    B = per_device_B * dp  # weak scaling: lanes grow with the mesh
    agent = DqnAgent(
        ModelCls=AtariDqnModel,
        model_kwargs=dict(channels=(16,), kernel_sizes=(3,), strides=(1,),
                          paddings=(0,), fc_sizes=(128,), obs_divisor=1.0),
        eps_steps=250_000, eps_final=0.1)
    algo = DQN(discount=0.99, batch_size=1024, min_steps_learn=0,
               replay_size=500_000, replay_ratio=1.0,
               target_update_interval=500, learning_rate=3e-4,
               double_dqn=True, n_step_return=3)
    kwargs = dict(algo=algo, agent=agent, env=Breakout(),
                  batch_spec=BatchSpec(T=T, B=B),
                  n_steps=(n_intervals + 2) * T * B, seed=0,
                  log_interval_steps=T * B, max_decorrelation_steps=100)
    runner = (MinibatchRl(**kwargs) if dp == 1
              else SyncRl(mesh=MeshSpec(dp=dp), **kwargs))
    carry = runner.startup()
    carry, _, _ = runner._run_interval(carry)  # compile + warmup
    jax.block_until_ready(carry.train_state.params)
    t0 = time.perf_counter()
    for _ in range(n_intervals):
        carry, _, _ = runner._run_interval(carry)
    jax.block_until_ready(carry.train_state.params)
    dt = time.perf_counter() - t0
    return n_intervals * runner.itrs_per_interval * T * B / dt


def main():
    import os

    # Honor JAX_PLATFORMS=cpu BEFORE backend init: images shipping a TPU
    # plugin pin the platform, so the env var alone is not authoritative
    # (same workaround as tests/conftest.py).
    want_cpu = os.environ.get("JAX_PLATFORMS", "") == "cpu"
    import jax

    if want_cpu:
        jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser()
    ap.add_argument("--dp", type=int, nargs="*", default=None,
                    help="dp sizes to measure (default: 1..n_devices "
                         "powers of two)")
    args = ap.parse_args()
    n_dev = len(jax.devices())
    dps = args.dp
    if not dps:
        dps = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]
    results = {}
    for dp in dps:
        results[str(dp)] = round(measure(dp), 1)
    base = results[str(dps[0])] / dps[0]
    eff = {str(dp): round(results[str(dp)] / (dp * base), 3)
           for dp in dps}
    print(json.dumps({
        "metric": "dp weak-scaling env-steps/s (MinAtar Breakout DQN)",
        "steps_per_s": results,
        "efficiency_vs_linear": eff,
        "devices": [str(d) for d in jax.devices()[:4]],
        "virtual_cpu_note": (
            "virtual host devices share cores; numbers validate "
            "program structure only" if jax.devices()[0].platform
            == "cpu" else None),
    }))


if __name__ == "__main__":
    main()
