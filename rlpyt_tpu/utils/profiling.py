"""Profiling harness (SURVEY.md §5.1 — the reference has only
StepsPerSecond counters in runners/minibatch_rl.py:log_diagnostics
~L250; this is the TPU-native upgrade).

- ``trace(log_dir)``: jax.profiler trace context → TensorBoard /
  Perfetto trace of device programs (XLA ops, fusion, HBM traffic).
- ``time_fn``: block_until_ready wall timing of a jitted callable with
  warmup, the standard JAX microbench discipline.
- ``device_memory_stats``: live HBM usage per device.
"""
from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Any, Callable, Dict

import jax


@contextmanager
def trace(log_dir: str):
    """Profile a region: `with trace("/tmp/prof"): run()` then open in
    TensorBoard (Trace Viewer) or Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2,
            **kwargs) -> Dict[str, float]:
    """Wall-time a (jitted) callable with proper synchronization."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {"mean_s": dt, "iters_per_s": 1.0 / dt}


def enable_persistent_compilation_cache(
        cache_dir: str = "/tmp/rlpyt_tpu_jax_cache") -> None:
    """Turn on JAX's on-disk compilation cache so repeated launches of
    the same program (curve sweeps, benches, resumed runs) skip XLA
    re-compilation.  The fused interval programs here are large — the
    R2D1 MinAtar interval compiles in minutes on a tunneled TPU backend
    but replays from cache in seconds — so every multi-run harness
    (curves/run_curves.py, bench*.py) calls this first."""
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def device_memory_stats() -> Dict[str, Any]:
    """Per-device HBM stats where the backend reports them."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
