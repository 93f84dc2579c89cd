"""Atari-scale bench: Nature-CNN DQN on 104x80x4 uint8 frames
(BASELINE.md metric #1 at representative compute; VERDICT round-1
item #4a).

MinAtar cannot proxy the flagship model's compute (one 16-ch conv on
10x10 vs 32/64/64 convs on 104x80), so this bench runs the full
fused rollout+learn program — AtariDqnModel (rlpyt
models/dqn/atari_dqn_model.py Nature-CNN geometry), frame-compressed
uint8 replay, double-DQN n-step updates — on an on-device synthetic
frame source with real frame-stack semantics (each step shares 3 of 4
frames with the previous step, episode boundaaries reset the stack).
ALE itself is a host C library (see envs/atari.py for the host path);
the synthetic source isolates what this bench measures: device-side
env-steps/s and achieved FLOP/s at Atari frame geometry.

Reports env-steps/s/chip AND model-FLOP utilization: XLA's own cost
analysis of the compiled interval program divided by wall-clock and by
the chip's peak (by device_kind).  Prints ONE JSON line like bench.py.

Documented deviation from rlpyt's serial Pong config: B=128 lockstep
env lanes (TPU-idiomatic; rlpyt steps 1 env) and update batch 256
instead of 32 (MXU tile honesty) at the same replay_ratio=8 — the
trained-samples-per-env-step data efficiency is unchanged.
"""
from __future__ import annotations

import json
import time
from typing import NamedTuple

import numpy as np

H, W, K = 104, 80, 4
N_ACTIONS = 6  # ALE Pong action-set size

# bf16 peak TFLOP/s by TPU generation (public spec sheets); fp32 path
# runs lower — we report against bf16 peak with the model in bf16.
PEAK_TFLOPS = {
    "v4": 275.0, "v5 lite": 197.0, "v5e": 197.0, "v5p": 459.0,
    "v6 lite": 918.0, "v6e": 918.0,
}


def chip_peak_tflops(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for key, peak in PEAK_TFLOPS.items():
        if key in kind:
            return peak
    return 197.0  # conservative default (v5e)


def make_env():
    import jax
    import jax.numpy as jnp

    from rlpyt_tpu.envs.base import Env, EnvStep
    from rlpyt_tpu.spaces import IntBox

    base = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (H, W), np.int32))

    def frame(t):
        # Pure function of t: consecutive stacks share K-1 frames.
        return ((base * (t % 251 + 3) + t * 13) & 0xFF).astype(jnp.uint8)

    EP_LEN = 2000  # episodes live on [k*EP_LEN, (k+1)*EP_LEN)

    class State(NamedTuple):
        t: jax.Array  # global frame counter; episode start = t - t%EP_LEN

    def stack_at(t):
        # obs[k] = frame(t-(K-1-k)), oldest -> newest, zeroed before the
        # episode start — real Atari frame-stack semantics so the
        # frame-compressed replay's reconstruction path is exercised
        # exactly as on the ALE host path.
        ts = t - jnp.arange(K - 1, -1, -1)
        frames = jax.vmap(frame)(ts)
        valid = (ts >= t - t % EP_LEN)[:, None, None]
        return jnp.where(valid, frames, 0)

    class SyntheticAtariEnv(Env):
        """On-device frame source with Atari geometry (bench-only)."""

        @property
        def observation_space(self):
            return IntBox(0, 256, (K, H, W), jnp.uint8)

        @property
        def action_space(self):
            return IntBox(0, N_ACTIONS)

        def reset(self, key, params=None):
            t0 = jax.random.randint(key, (), 0, 1000) * EP_LEN
            s = State(t=t0)
            return s, stack_at(t0)

        def step(self, key, state, action, params=None):
            t = state.t + 1
            reward = (action == (t % N_ACTIONS)).astype(jnp.float32)
            done = (t % EP_LEN) == 0
            return State(t=t), EnvStep(stack_at(t), reward, done, {})

    return SyntheticAtariEnv()


def main():
    import sys

    import jax
    import jax.numpy as jnp

    from rlpyt_tpu.agents.dqn import DqnAgent
    from rlpyt_tpu.algos.dqn import DQN
    from rlpyt_tpu.models.dqn import AtariDqnModel
    from rlpyt_tpu.runners.train import MinibatchRl
    from rlpyt_tpu.samplers.rollout import BatchSpec

    smoke = "--smoke" in sys.argv  # CI/CPU: tiny shapes, same program
    if smoke:
        jax.config.update("jax_platforms", "cpu")
    B, T = (8, 8) if smoke else (128, 32)
    agent = DqnAgent(
        ModelCls=AtariDqnModel,
        model_kwargs=dict(dueling=False, compute_dtype=jnp.bfloat16),
        eps_steps=250_000, eps_final=0.01)
    algo = DQN(discount=0.99, batch_size=32 if smoke else 256,
               min_steps_learn=0,
               replay_size=4_000 if smoke else 200_000, replay_ratio=8.0,
               target_update_interval=2_500, learning_rate=2.5e-4,
               double_dqn=True, n_step_return=1,
               frame_buffer=True, frames_per_obs=K)
    runner = MinibatchRl(algo=algo, agent=agent, env=make_env(),
                         batch_spec=BatchSpec(T=T, B=B),
                         n_steps=20 * T * B, seed=0,
                         log_interval_steps=T * B,
                         max_decorrelation_steps=0)
    carry = runner.startup()

    compiled = runner._run_interval.lower(carry).compile()
    cost = compiled.cost_analysis()
    # cost_analysis() can be None or an empty list on some
    # backends/versions; degrade to flops=0 instead of raising.
    cost = cost[0] if isinstance(cost, (list, tuple)) and cost \
        else (cost or {})
    flops_per_interval = float(cost.get("flops", 0.0))

    carry, _, _ = runner._run_interval(carry)  # warmup (compile cached)
    jax.block_until_ready(carry.train_state.params)

    n_intervals = 2 if smoke else 10
    t0 = time.perf_counter()
    for _ in range(n_intervals):
        carry, opt_infos, traj_stats = runner._run_interval(carry)
    jax.block_until_ready(carry.train_state.params)
    dt = time.perf_counter() - t0

    steps = n_intervals * runner.itrs_per_interval * T * B
    sps = steps / dt
    achieved_tflops = flops_per_interval * n_intervals / dt / 1e12
    peak = chip_peak_tflops(jax.devices()[0])
    print(json.dumps({
        "metric": "env-steps/s/chip (Nature-CNN 104x80x4 uint8 DQN "
                  f"fused rollout+learn, B={B}, replay_ratio=8, "
                  "frame-compressed replay, bf16)",
        "value": round(sps, 1),
        "unit": "env-steps/s",
        "flops_per_interval": flops_per_interval,
        "achieved_tflops": round(achieved_tflops, 2),
        "peak_tflops": peak,
        "mfu": round(achieved_tflops / peak, 4),
        "device": str(jax.devices()[0].device_kind),
    }))


if __name__ == "__main__":
    main()
