"""Headline benchmark — env-steps/s/chip for the fused rollout+learn loop.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference baseline (BASELINE.md) is rlpyt's serial sampler throughput
for a small-model env on CPU — the configuration of reference
examples/example_1.py.  rlpyt's serial path steps envs one python call at
a time with a per-step model forward; measured rlpyt-class serial
throughput for MLP policies is ~2e3 env-steps/s (BASELINE.md "operative
baseline is to be measured"; this constant is the stand-in until the
reference mount is populated).  Target from BASELINE.json: >=10x per chip.
"""
from __future__ import annotations

import json
import time

RLPYT_SERIAL_STEPS_PER_S = 2_000.0  # see BASELINE.md (estimate, to re-measure)


def main():
    import jax

    from rlpyt_tpu.agents.dqn import DqnAgent
    from rlpyt_tpu.algos.dqn import DQN
    from rlpyt_tpu.envs.classic import CartPole
    from rlpyt_tpu.models.dqn import DqnMlpModel
    from rlpyt_tpu.runners.train import MinibatchRl
    from rlpyt_tpu.samplers.rollout import BatchSpec

    B, T = 1024, 32
    agent = DqnAgent(ModelCls=DqnMlpModel,
                     model_kwargs=dict(hidden_sizes=(256, 256)),
                     eps_steps=100_000)
    algo = DQN(batch_size=512, min_steps_learn=0, replay_size=1_000_000,
               replay_ratio=1.0, target_update_interval=300,
               learning_rate=5e-4)
    runner = MinibatchRl(algo=algo, agent=agent, env=CartPole(),
                         batch_spec=BatchSpec(T=T, B=B),
                         n_steps=10 * T * B, seed=0,
                         log_interval_steps=T * B,
                         max_decorrelation_steps=50)
    carry = runner.startup()

    # warmup (compile + first interval)
    carry, _, _ = runner._run_interval(carry)
    jax.block_until_ready(carry.train_state.params)

    n_intervals = 8
    t0 = time.perf_counter()
    for _ in range(n_intervals):
        carry, opt_infos, traj_stats = runner._run_interval(carry)
    jax.block_until_ready(carry.train_state.params)
    dt = time.perf_counter() - t0

    steps = n_intervals * runner.itrs_per_interval * T * B
    sps = steps / dt
    print(json.dumps({
        "metric": "env-steps/s/chip (CartPole DQN fused rollout+learn, "
                  f"B={B}, replay_ratio=1)",
        "value": round(sps, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(sps / RLPYT_SERIAL_STEPS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
