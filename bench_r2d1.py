"""R2D1 throughput bench (VERDICT r2 item #4; SURVEY §6 — rlpyt's
headline efficiency claim is R2D1).

Times the fused R2D1 MinAtar program — scan rollout with LSTM carry,
prioritized sequence replay (warmup_T burn-in + batch_T windows, stored
rnn state), two-stream LSTM re-materialization updates — at the curve
config's geometry (B=64, T=40, the rlpyt-parity sampler shape) and at a
chip-filling geometry.  Prints one JSON line per geometry.

Context: round-2's curve artifact logged ~1k env-steps/s — that was
compile + host contention, not program speed; the steady-state program
measured here is ~360k steps/s at the curve geometry (see BASELINE.md).
"""
from __future__ import annotations

import json
import time


def run_config(B: int, T: int, batch_b: int, n_intervals: int = 5,
               log_steps: int = 100_000):
    import copy

    import jax

    from rlpyt_tpu.agents.dqn import R2d1Agent
    from rlpyt_tpu.algos.r2d1 import R2D1
    from rlpyt_tpu.envs.minatar import make_minatar
    from rlpyt_tpu.experiments.configs.minatar_dqn import configs
    from rlpyt_tpu.models.dqn import AtariR2d1Model
    from rlpyt_tpu.runners.train import MinibatchRl
    from rlpyt_tpu.samplers.rollout import BatchSpec

    cfg = copy.deepcopy(configs["r2d1"])
    cfg["algo"]["batch_b"] = batch_b
    env_kw = {k: v for k, v in cfg["env"].items() if k != "game"}
    env = make_minatar("breakout", **env_kw)
    agent = R2d1Agent(ModelCls=AtariR2d1Model,
                      model_kwargs=cfg["model"], **cfg["agent"])
    cfg["algo"]["min_steps_learn"] = 0
    algo = R2D1(**cfg["algo"])
    runner = MinibatchRl(algo=algo, agent=agent, env=env,
                         batch_spec=BatchSpec(T, B),
                         n_steps=100 * log_steps, seed=0,
                         log_interval_steps=log_steps,
                         max_decorrelation_steps=0)
    carry = runner.startup()
    carry, oi, _ = runner._run_interval(carry)  # compile + warmup
    jax.block_until_ready(oi.loss)
    t0 = time.perf_counter()
    for _ in range(n_intervals):
        carry, oi, _ = runner._run_interval(carry)
    jax.block_until_ready(oi.loss)
    dt = time.perf_counter() - t0
    steps = n_intervals * runner.itrs_per_interval * T * B
    return {
        "metric": "env-steps/s/chip (MinAtar R2D1 fused rollout+learn: "
                  f"LSTM scan, prioritized sequence replay, B={B}, "
                  f"T={T}, update batch_b={batch_b}, "
                  f"replay_ratio={algo.replay_ratio})",
        "value": round(steps / dt, 1),
        "unit": "env-steps/s",
        "updates_per_itr": algo.updates_per_optimize,
        "device": str(jax.devices()[0].device_kind),
    }


def run_atari_config(B: int, T: int, batch_b: int, warmup_T: int = 20,
                     n_intervals: int = 5):
    """Atari-geometry R2D1 (the reference's R2D1 headline domain,
    rlpyt/experiments/configs/atari/dqn/atari_r2d1.py): Nature-CNN
    104x80x4 uint8 frames -> LSTM 512 -> dueling Q, frame-compressed
    prioritized sequence replay with stored rnn state, synthetic
    deterministic frames (bench_atari.make_env) so the bench needs no
    emulator."""
    import time as _time

    import jax

    from bench_atari import make_env
    from rlpyt_tpu.agents.dqn import R2d1Agent
    from rlpyt_tpu.algos.r2d1 import R2D1
    from rlpyt_tpu.models.dqn import AtariR2d1Model
    from rlpyt_tpu.runners.train import MinibatchRl
    from rlpyt_tpu.samplers.rollout import BatchSpec
    import jax.numpy as jnp

    agent = R2d1Agent(
        ModelCls=AtariR2d1Model,
        model_kwargs=dict(compute_dtype=jnp.bfloat16),
        eps_steps=250_000, eps_final=0.1, eps_final_min=0.0005,
        lstm_size=512)
    algo = R2D1(discount=0.997, batch_b=batch_b, batch_T=T,
                warmup_T=warmup_T, min_steps_learn=0,
                replay_size=100_000, replay_ratio=1.0,
                target_update_interval=1_000, learning_rate=1e-4,
                double_dqn=True, prioritized_replay=True,
                frame_compress=True, frames_per_obs=4,
                input_priorities=True)
    runner = MinibatchRl(algo=algo, agent=agent, env=make_env(),
                         batch_spec=BatchSpec(T, B),
                         n_steps=100 * T * B, seed=0,
                         log_interval_steps=T * B,
                         max_decorrelation_steps=0)
    carry = runner.startup()
    carry, oi, _ = runner._run_interval(carry)  # compile + warmup
    jax.block_until_ready(oi.loss)
    t0 = _time.perf_counter()
    for _ in range(n_intervals):
        carry, oi, _ = runner._run_interval(carry)
    jax.block_until_ready(oi.loss)
    dt = _time.perf_counter() - t0
    steps = n_intervals * runner.itrs_per_interval * T * B
    return {
        "metric": "env-steps/s/chip (Atari-geometry R2D1 fused "
                  "rollout+learn: Nature-CNN 104x80x4 uint8 -> LSTM 512 "
                  f"-> dueling Q, frame-compressed seq-PER, B={B}, T={T}, "
                  f"warmup_T={warmup_T}, batch_b={batch_b}, "
                  f"replay_ratio={algo.replay_ratio})",
        "value": round(steps / dt, 1),
        "unit": "env-steps/s",
        "updates_per_itr": algo.updates_per_optimize,
        "device": str(jax.devices()[0].device_kind),
    }


def main():
    import sys

    from rlpyt_tpu.utils.profiling import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    if "--atari" in sys.argv:
        print(json.dumps(run_atari_config(B=64, T=40, batch_b=32)),
              flush=True)
        print(json.dumps(run_atari_config(B=256, T=40, batch_b=64)),
              flush=True)
        return
    # curve-parity geometry (configs/minatar_dqn.py r2d1 sampler shape)
    print(json.dumps(run_config(B=64, T=40, batch_b=32)), flush=True)
    # chip-filling geometry: more lanes + bigger update batch at the
    # same replay ratio
    print(json.dumps(run_config(B=1024, T=40, batch_b=512)), flush=True)


if __name__ == "__main__":
    main()
