"""Profile the Nature-CNN flagship program (VERDICT r3 items #2/#8:
attribute the gap between 18% MFU and the ~44% structural ceiling with
a real trace instead of assertion, and validate the analytic
5x-fwd-per-sample MFU denominator).

Two instruments:

1. **Component timing** — the update pipeline re-jitted piece by piece
   (replay sample/frame-gather, loss forward, value_and_grad, the full
   update incl. optimizer + priorities, rollout-only) so each stage's
   share of the interval is a measured number.
2. **Device trace** — ``jax.profiler`` trace of timed intervals,
   aggregated per HLO op name into a category table (convolutions,
   fusions, copies/transposes, gathers/scatters, ...).  The raw
   .trace.json.gz stays in /tmp; the aggregate goes to
   ``profiles/flagship_profile.json`` (committed).

Usage: python bench_profile.py [--B 2048] [--smoke]
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import time
from collections import defaultdict


def time_it(fn, *args, iters=20, warmup=2):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def parse_trace(logdir):
    """Aggregate EXCLUSIVE (self) device-side op durations from the
    Perfetto JSON trace jax.profiler writes.  Parent spans (while /
    conditional / fusion wrappers) have the time of their children
    subtracted, so categories sum to device-busy time, not 5x it."""
    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        return None
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    proc_name, thread_name = {}, {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            proc_name[e["pid"]] = e.get("args", {}).get("name", "")
        elif e.get("name") == "thread_name":
            thread_name[(e["pid"], e.get("tid"))] = (
                e.get("args", {}).get("name", ""))
    device_pids = {pid for pid, n in proc_name.items()
                   if "TPU" in n or "/device" in n.lower() or "GPU" in n}
    if not device_pids:  # CPU backend: one '/host:CPU' process
        device_pids = set(proc_name)
    # Track selection: "XLA Modules" / "Steps" tracks duplicate the op
    # tracks wholesale; keep only op-level tracks when names are known.
    tracks = defaultdict(list)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        tn = thread_name.get((e["pid"], e.get("tid")), "")
        if any(k in tn for k in ("XLA Modules", "Steps", "Framework",
                                 "Source", "Python", "Host")):
            continue
        tracks[(e["pid"], e.get("tid"))].append(
            {"ts": float(e.get("ts", 0.0)),
             "dur": float(e.get("dur", 0.0)),
             "name": e.get("name", "?")})
    if not tracks:
        return None

    per_op = defaultdict(float)
    busy = 0.0
    t_min, t_max = float("inf"), 0.0
    for evs in tracks.values():
        evs.sort(key=lambda e: (e["ts"], -e["dur"]))
        stack = []  # [name, ts, end, direct_child_dur]

        def close_until(ts):
            nonlocal stack
            while stack and stack[-1][2] <= ts + 1e-9:
                name, ts0, end0, child = stack.pop()
                per_op[name] += max(0.0, (end0 - ts0) - child)

        for e in evs:
            ts, dur, name = e["ts"], e["dur"], e["name"]
            end = ts + dur
            t_min = min(t_min, ts)
            t_max = max(t_max, end)
            close_until(ts)
            if stack and end <= stack[-1][2] + 1e-9:
                stack[-1][3] += dur          # nested: child of open span
            else:
                busy += dur                  # top-level span
            stack.append([name, ts, end, 0.0])
        close_until(float("inf"))
    per_op = {k: v for k, v in per_op.items() if v > 0}
    if not per_op:
        return None
    total = sum(per_op.values())
    wall = max(t_max - t_min, 1e-9)

    def bucket(name):
        n = name.lower()
        for key in ("convolution", "dot", "cumsum", "sort", "copy",
                    "transpose", "gather", "scatter", "reduce",
                    "dynamic-update", "dynamic_update", "dynamic-slice",
                    "dynamic_slice", "select", "iota", "broadcast",
                    "all-reduce", "rng", "fusion", "while",
                    "conditional", "convert"):
            if key in n:
                return key
        return "other"

    cats = defaultdict(float)
    for name, dur in per_op.items():
        cats[bucket(name)] += dur
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:30]
    return {
        "trace_file": paths[-1],
        "basis": "exclusive self-times per track (nested child spans "
                 "subtracted; module/step tracks excluded)",
        "device_busy_us": round(busy, 1),
        "device_span_us": round(wall, 1),
        "device_busy_frac_of_span": round(busy / wall, 4),
        "self_time_total_us": round(total, 1),
        "categories_us": {k: round(v, 1) for k, v in
                          sorted(cats.items(), key=lambda kv: -kv[1])},
        "categories_pct": {k: round(100.0 * v / total, 2) for k, v in
                           sorted(cats.items(), key=lambda kv: -kv[1])},
        "model_math_us": round(cats.get("convolution", 0.0)
                               + cats.get("dot", 0.0), 1),
        "top_ops": [{"name": n, "us": round(d, 1),
                     "pct": round(100.0 * d / total, 2)}
                    for n, d in top],
    }


def dump_hlo_ops(text, names, out_path):
    """Extract the defining line (shape + operands) of each named HLO
    instruction from optimized-HLO text, plus the body of the fused
    computation it calls — identifies what the trace's top ops (e.g.
    'fusion.637', 'copy.172') actually compute."""
    import re
    lines = text.splitlines()
    defs = {}
    comps = {}  # computation name -> (start, end) line span
    cur = None
    for i, ln in enumerate(lines):
        m = re.match(r"\s*%?([\w\.\-_]+)\s+\([^)]*\)\s+->", ln)
        if ln.strip().startswith(("%fused_computation", "fused_computation")) \
                and "{" in ln:
            cur = ln.strip().split()[0].lstrip("%")
            comps[cur] = [i, i]
        elif cur is not None:
            comps[cur][1] = i
            if ln.strip() == "}":
                cur = None
    found = {}
    for name in names:
        pat = re.compile(r"%" + re.escape(name) + r"\s*=")
        for ln in lines:
            if pat.search(ln):
                entry = {"def": ln.strip()[:2000]}
                m = re.search(r"calls=%?([\w\.\-_]+)", ln)
                if m and m.group(1) in comps:
                    a, b = comps[m.group(1)]
                    entry["called_computation"] = [
                        l.strip()[:400] for l in lines[a:b + 1][:60]]
                found[name] = entry
                break
    with open(out_path, "w") as f:
        json.dump(found, f, indent=1)
    print(f"wrote {out_path}: {sorted(found)}")
    return found


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=2048)
    ap.add_argument("--T", type=int, default=32)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--hlo", action="store_true",
                    help="also dump the defining HLO of the trace's top "
                         "ops (reads the existing profile JSON's "
                         "top_ops) to profiles/flagship_hlo_B<B>.json")
    ap.add_argument("--trace-dir", default="/tmp/rlpyt_tpu_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rlpyt_tpu.utils.profiling import (
        enable_persistent_compilation_cache,
        trace,
    )

    enable_persistent_compilation_cache()
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        args.B, args.T = 8, 8

    from bench_atari import build_runner, nature_cnn_fwd_flops

    B, T = args.B, args.T
    ub = 2 * B
    runner = build_runner(B=B, T=T, update_batch=ub, replay_ratio=8.0)
    algo = runner.algo
    carry = runner.startup()
    # Fill the replay ring once so sampled gathers hit realistic data.
    carry, _, _ = runner._run_interval(carry)
    jax.block_until_ready(carry.train_state.params)

    if args.hlo:
        tag = "smoke" if args.smoke else f"B{B}"
        pdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "profiles")
        prof = json.load(open(os.path.join(
            pdir, f"flagship_profile_{tag}.json")))
        names = [o["name"] for o in prof["trace"]["top_ops"][:15]]
        compiled = runner._run_interval.lower(carry).compile()
        dump_hlo_ops(compiled.as_text(), names,
                     os.path.join(pdir, f"flagship_hlo_{tag}.json"))
        return

    ts, rs = carry.train_state, carry.replay_state
    key = jax.random.key(123)

    # --- component timings ------------------------------------------------
    sample = jax.jit(lambda rs, k: algo.replay.sample(rs, k, ub))
    batch = jax.block_until_ready(sample(rs, key))
    loss_fwd = jax.jit(lambda p, tp, b: algo.loss(p, tp, b)[0])
    vgrad = jax.jit(lambda p, tp, b: jax.value_and_grad(
        algo.loss, has_aux=True)(p, tp, b))
    one_update = jax.jit(lambda ts, rs, k: algo._one_update(ts, rs, k))
    rollout = jax.jit(lambda p, st: runner.collector.collect(p, st))
    # Forward-only model pass at the update batch (the unit of the
    # analytic denominator: one "fwd").
    obs = batch.agent_inputs[0]
    q_fwd = jax.jit(lambda p, o: algo.agent.q(p, o, *batch.agent_inputs[1:]))

    # The pieces _one_update composes, timed standalone (VERDICT r4
    # item #3: the ledger must sum to >=90% of one_update).
    import optax as _optax

    def _opt_step(grads, opt_state, params):
        updates, opt_state = algo.optimizer.update(grads, opt_state,
                                                   params)
        return _optax.apply_updates(params, updates), opt_state

    opt_step = jax.jit(_opt_step)

    def _target_refresh(target, params, counter):
        return jax.tree.map(
            lambda t, o: jnp.where(
                counter % algo.target_update_interval == 0, o, t),
            target, params)

    target_refresh = jax.jit(_target_refresh)
    prio_update = jax.jit(
        lambda rs, idx, td: algo.replay.update_priorities(rs, idx, td))

    def _k_updates(ts, rs, key):
        keys = jax.random.split(key, algo.updates_per_optimize)

        def body(carry, k):
            t, r = carry
            t, r, info = algo._one_update(t, r, k)
            return (t, r), info.loss

        (ts, rs), losses = jax.lax.scan(body, (ts, rs), keys)
        return ts, rs, losses

    k_updates = jax.jit(_k_updates)

    (_, td_abs), grads = jax.block_until_ready(
        vgrad(ts.params, ts.target_params, batch))

    comp = {}
    comp["replay_sample_ms"] = time_it(sample, rs, key) * 1e3
    comp["q_fwd_update_batch_ms"] = time_it(q_fwd, ts.params, obs) * 1e3
    comp["loss_fwd_ms"] = time_it(loss_fwd, ts.params, ts.target_params,
                                  batch) * 1e3
    comp["value_and_grad_ms"] = time_it(vgrad, ts.params, ts.target_params,
                                        batch) * 1e3
    comp["optimizer_step_ms"] = time_it(opt_step, grads, ts.opt_state,
                                        ts.params) * 1e3
    comp["target_refresh_ms"] = time_it(
        target_refresh, ts.target_params, ts.params,
        ts.update_counter) * 1e3
    has_prio = hasattr(batch, "indices") and algo.prioritized_replay
    if has_prio:
        comp["priority_update_ms"] = time_it(
            prio_update, rs, batch.indices, td_abs) * 1e3
    comp["one_update_ms"] = time_it(one_update, ts, rs, key) * 1e3
    comp["k_updates_scan_per_update_ms"] = time_it(
        k_updates, ts, rs, key,
        iters=5) * 1e3 / max(algo.updates_per_optimize, 1)
    comp["rollout_ms"] = time_it(rollout, ts.params,
                                 carry.rollout_state) * 1e3

    # --- whole-interval timing -------------------------------------------
    n_int = 1 if args.smoke else 3
    t0 = time.perf_counter()
    for _ in range(n_int):
        carry, _, _ = runner._run_interval(carry)
    jax.block_until_ready(carry.train_state.params)
    interval_s = (time.perf_counter() - t0) / n_int
    k_upd = algo.updates_per_optimize
    itrs = runner.itrs_per_interval

    # --- trace capture ----------------------------------------------------
    os.makedirs(args.trace_dir, exist_ok=True)
    with trace(args.trace_dir):
        carry, _, _ = runner._run_interval(carry)
        jax.block_until_ready(carry.train_state.params)
    trace_summary = parse_trace(args.trace_dir)

    # --- reconciliation of the analytic denominator (VERDICT #8) ---------
    f = nature_cnn_fwd_flops()
    # measured per-update cost in fwd-equivalents at the update batch:
    fwd = comp["q_fwd_update_batch_ms"]
    recon = {
        "analytic_fwd_equivalents_per_update": 5.0,
        "measured_loss_fwd_in_fwd_units": round(
            comp["loss_fwd_ms"] / fwd, 2),
        "measured_value_and_grad_in_fwd_units": round(
            comp["value_and_grad_ms"] / fwd, 2),
        "measured_one_update_in_fwd_units": round(
            comp["one_update_ms"] / fwd, 2),
        "q_fwd_achieved_tflops": round(
            ub * f / (fwd * 1e-3) / 1e12, 2),
        "note": "loss fwd = 3 stop-grad/grad fwd passes (online, "
                "target, double-DQN online-next); grad adds ~2 fwd of "
                "bwd; one_update adds replay gather + optimizer + "
                "priority scatter.",
    }

    # --- update-time ledger (VERDICT r4 item #3) -------------------------
    parts = ["replay_sample_ms", "value_and_grad_ms", "optimizer_step_ms",
             "target_refresh_ms"]
    if has_prio:
        parts.append("priority_update_ms")
    parts_sum = sum(comp[p] for p in parts)
    ledger = {
        "parts": {p: round(comp[p], 3) for p in parts},
        "parts_sum_ms": round(parts_sum, 3),
        "one_update_ms": round(comp["one_update_ms"], 3),
        "parts_over_one_update": round(
            parts_sum / comp["one_update_ms"], 3),
        "in_scan_per_update_ms": round(
            comp["k_updates_scan_per_update_ms"], 3),
        "standalone_vs_in_scan": round(
            comp["one_update_ms"]
            / comp["k_updates_scan_per_update_ms"], 3),
        "note": "parts are standalone jits; the fused one_update can be "
                "faster (XLA fuses across stage boundaries) or slower "
                "(scan-carried buffers). in_scan_per_update is the "
                "k-update lax.scan divided by k — the cost the interval "
                "program actually pays per update.",
    }

    # bf16 peak by device kind (ADVICE r4: don't hardcode 197);
    # unknown device (incl. --smoke CPU) -> mfu is null, basis recorded.
    from bench_atari import PEAK_TFLOPS
    kind = str(jax.devices()[0].device_kind)
    peak = next((v for k, v in PEAK_TFLOPS.items()
                 if k in kind.lower()), None)
    analytic_interval_tflop = (
        itrs * (T * B * f + k_upd * ub * 5.0 * f)) / 1e12

    # accounting of the interval from components:
    acct = {
        "interval_s": round(interval_s, 4),
        "itrs_per_interval": itrs,
        "updates_per_itr": k_upd,
        "per_itr_ms": round(interval_s / itrs * 1e3, 2),
        "rollout_share_pct": round(
            100 * comp["rollout_ms"] * itrs / (interval_s * 1e3), 1),
        "updates_share_pct_est": round(
            100 * comp["k_updates_scan_per_update_ms"] * k_upd * itrs
            / (interval_s * 1e3), 1),
        "env_steps_per_s": round(itrs * T * B / interval_s, 1),
        "peak_tflops": peak,
        "mfu": (round(analytic_interval_tflop / interval_s / peak, 4)
                if peak else None),
    }

    # --- model-math MFU ceiling (VERDICT r4 item #4) ---------------------
    # The FLOPs carrier of the update is value_and_grad (analytic 5
    # fwd-equivalents: 3 fwd in the loss + ~2 fwd of backward).  Its
    # standalone achieved rate IS the structural ceiling: if the replay
    # gather, convert, optimizer and target refresh all vanished, the
    # update program would run at this MFU.  (The trace's raw conv+dot
    # bucket is NOT usable for this: on TPU the convs live inside
    # fusion ops — conv self-time reads only ~4% of busy — so that
    # number undercounts model math and is reported only as a floor.)
    ceiling = None
    if peak:
        grad_tflops = (5.0 * ub * f / (comp["value_and_grad_ms"] * 1e-3)
                       / 1e12)
        ceiling = {
            "grad_pass_achieved_tflops_analytic": round(grad_tflops, 1),
            "grad_pass_mfu_ceiling": round(grad_tflops / peak, 4),
            "in_scan_update_achieved_tflops_analytic": round(
                5.0 * ub * f
                / (comp["k_updates_scan_per_update_ms"] * 1e-3) / 1e12,
                1),
            "in_scan_update_mfu": round(
                5.0 * ub * f
                / (comp["k_updates_scan_per_update_ms"] * 1e-3) / 1e12
                / peak, 4),
            "trace_conv_dot_self_us": (
                trace_summary.get("model_math_us")
                if trace_summary else None),
            "basis": "analytic 5 fwd-equivalents per trained sample "
                     "over measured value_and_grad time (standalone "
                     "jit); the in_scan_update row is the same basis "
                     "over the k-update lax.scan per-update time — the "
                     "MFU the interval actually achieves on updates",
        }

    out = {
        "geometry": {"B": B, "T": T, "update_batch": ub,
                     "replay_ratio": 8.0,
                     "updates_per_optimize": k_upd},
        "components_ms": {k: round(v, 3) for k, v in comp.items()},
        "update_time_ledger": ledger,
        "interval_accounting": acct,
        "model_math_ceiling": ceiling,
        "fwd_unit_reconciliation": recon,
        "trace": trace_summary,
        "device": kind,
    }
    print(json.dumps(out, indent=1))
    os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "profiles"), exist_ok=True)
    tag = "smoke" if args.smoke else f"B{B}"
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "profiles", f"flagship_profile_{tag}.json"),
              "w") as fjson:
        json.dump(out, fjson, indent=1)


if __name__ == "__main__":
    main()
