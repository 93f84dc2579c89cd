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

Reports env-steps/s/chip AND model-FLOP utilization (analytic FLOPs —
see nature_cnn_fwd_flops; XLA cost_analysis undercounts scan bodies).
Prints ONE JSON line like bench.py; ``--sweep`` prints one line per B
geometry.  Measured 2026-08-21 (TPU v5e) after the round-4 3D-conv
space-to-depth + blocked-frame-replay work: 34.4k steps/s at B=128,
peak 36.1k at B=1024 (22.5% MFU; was 23.8k / 28.9k / 18% in round 3).
Round-5 ledger (profiles/flagship_profile_B1024.json): the measured
structural ceiling is value_and_grad standalone at 70 TF/s analytic =
35.6% MFU (the earlier "~45% in-scan model math" figure was asserted,
never measured, and is retracted); the in-scan update achieves 44.8
TF/s = 22.7%, with the 13-point gap split across the replay row gather
+ uint8→bf16 convert+mask (convert_multiply fusion, ~12% of the
interval) and HBM copies (~19%).

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


def nature_cnn_fwd_flops(h=H, w=W, k_in=K,
                         channels=(32, 64, 64), kernels=(8, 4, 3),
                         strides=(4, 2, 1), paddings=(0, 1, 1),
                         fc=512, n_actions=N_ACTIONS) -> float:
    """Analytic forward FLOPs/sample for the Nature-CNN (2·MACs).

    XLA's compiled.cost_analysis() undercounts programs whose hot ops
    sit inside lax.scan bodies (the K-update loop is counted once, not
    K times), which made round-2's reported MFU ~100x too low — so the
    model FLOPs here are computed from the conv arithmetic directly."""
    flops = 0.0
    c_in = k_in
    for c, k, s, p in zip(channels, kernels, strides, paddings):
        h = (h + 2 * p - k) // s + 1
        w = (w + 2 * p - k) // s + 1
        flops += 2.0 * h * w * c * k * k * c_in
        c_in = c
    feat = h * w * c_in
    flops += 2.0 * feat * fc
    flops += 2.0 * fc * n_actions
    return flops


def build_runner(B: int, T: int, update_batch: int, replay_ratio: float,
                 replay_size: int = 200_000, RunnerCls=None,
                 n_intervals: int = 20, logger=None,
                 window_kernel: bool = False, **runner_kwargs):
    """Build the fused Nature-CNN flagship program at one geometry
    (shared by run_config, bench_profile.py and bench_async.py).
    ``RunnerCls`` defaults to MinibatchRl; pass AsyncRl (+ its kwargs)
    for the pipelined-runner comparison."""
    import jax.numpy as jnp

    from rlpyt_tpu.agents.dqn import DqnAgent
    from rlpyt_tpu.algos.dqn import DQN
    from rlpyt_tpu.models.dqn import AtariDqnModel
    from rlpyt_tpu.runners.train import MinibatchRl
    from rlpyt_tpu.samplers.rollout import BatchSpec

    if RunnerCls is None:
        RunnerCls = MinibatchRl
    agent = DqnAgent(
        ModelCls=AtariDqnModel,
        model_kwargs=dict(dueling=False, compute_dtype=jnp.bfloat16),
        eps_steps=250_000, eps_final=0.01)
    algo = DQN(discount=0.99, batch_size=update_batch,
               min_steps_learn=0,
               replay_size=replay_size, replay_ratio=replay_ratio,
               target_update_interval=2_500, learning_rate=2.5e-4,
               double_dqn=True, n_step_return=1,
               frame_buffer=True, frames_per_obs=K,
               blocked_frame_sampling=True,
               window_gather_kernel=window_kernel)
    if logger is not None:
        runner_kwargs["logger"] = logger
    runner = RunnerCls(algo=algo, agent=agent, env=make_env(),
                       batch_spec=BatchSpec(T=T, B=B),
                       n_steps=n_intervals * T * B, seed=0,
                       log_interval_steps=T * B,
                       max_decorrelation_steps=0, **runner_kwargs)
    return runner


def run_config(B: int, T: int, update_batch: int, replay_ratio: float,
               smoke: bool = False, n_intervals: int = 10,
               window_kernel: bool = False,
               replay_size: int = 200_000):
    """Build + time the fused Nature-CNN program at one geometry;
    returns the result dict (shared by main() and the --sweep mode)."""
    import time

    import jax

    runner = build_runner(B, T, update_batch, replay_ratio, replay_size,
                          window_kernel=window_kernel)
    algo = runner.algo
    carry = runner.startup()

    compiled = runner._run_interval.lower(carry).compile()
    cost = compiled.cost_analysis()
    # cost_analysis() can be None or an empty list on some
    # backends/versions; degrade to flops=0 instead of raising.
    cost = cost[0] if isinstance(cost, (list, tuple)) and cost \
        else (cost or {})
    xla_cost_flops = float(cost.get("flops", 0.0))

    # Analytic model FLOPs per interval (see nature_cnn_fwd_flops):
    # rollout = 1 fwd/env-step; each update = grad pass (~3x fwd) +
    # target fwd + double-DQN online argmax fwd = ~5x fwd per sample.
    f = nature_cnn_fwd_flops()
    k_upd = algo.updates_per_optimize
    flops_per_interval = runner.itrs_per_interval * (
        T * B * f + k_upd * update_batch * 5.0 * f)

    carry, _, _ = runner._run_interval(carry)  # warmup (compile cached)
    jax.block_until_ready(carry.train_state.params)

    t0 = time.perf_counter()
    for _ in range(n_intervals):
        carry, opt_infos, traj_stats = runner._run_interval(carry)
    jax.block_until_ready(carry.train_state.params)
    dt = time.perf_counter() - t0

    steps = n_intervals * runner.itrs_per_interval * T * B
    sps = steps / dt
    achieved_tflops = flops_per_interval * n_intervals / dt / 1e12
    peak = chip_peak_tflops(jax.devices()[0])
    return {
        "metric": "env-steps/s/chip (Nature-CNN 104x80x4 uint8 DQN "
                  f"fused rollout+learn, B={B}, update_batch="
                  f"{update_batch}, replay_ratio={replay_ratio}, "
                  "frame-compressed replay, bf16)",
        "value": round(sps, 1),
        "unit": "env-steps/s",
        "trained_frames_per_s": round(sps * replay_ratio, 1),
        "model_flops_per_interval": flops_per_interval,
        "xla_cost_flops_per_interval": xla_cost_flops,
        "achieved_model_tflops": round(achieved_tflops, 2),
        "peak_tflops": peak,
        "mfu": round(achieved_tflops / peak, 4),
        "device": str(jax.devices()[0].device_kind),
    }


def main():
    import sys

    import jax

    from rlpyt_tpu.utils.profiling import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    smoke = "--smoke" in sys.argv  # CI/CPU: tiny shapes, same program
    if smoke:
        jax.config.update("jax_platforms", "cpu")

    if "--sweep" in sys.argv:
        # B sweep at fixed replay_ratio=8 (VERDICT r2 item #1): update
        # batch scales with B so updates/step stays constant.
        out = []
        for B, ub in ((128, 256), (256, 512), (512, 1024), (1024, 2048),
                      (2048, 4096), (4096, 8192)):
            r = run_config(B=B, T=32, update_batch=ub, replay_ratio=8.0,
                           n_intervals=5)
            print(json.dumps(r), flush=True)
            out.append(r)
        return

    if smoke:
        print(json.dumps(run_config(B=8, T=8, update_batch=32,
                                    replay_ratio=8.0, smoke=True,
                                    n_intervals=2, replay_size=4_000)))
        return
    print(json.dumps(run_config(B=128, T=32, update_batch=256,
                                replay_ratio=8.0)))


if __name__ == "__main__":
    main()
