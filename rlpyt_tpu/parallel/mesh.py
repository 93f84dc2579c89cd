"""Device-mesh resource mapping — the TPU-native replacement for rlpyt's
affinity system (reference: rlpyt/utils/launching/affinity.py:make_affinity,
encode_affinity, affinity_from_code ~L20-300) and its multi-GPU runners
(rlpyt/runners/sync_rl.py:SyncRlMixin — torch.distributed + DDP).

rlpyt maps CPUs/GPUs to master/worker/optimizer roles via encoded affinity
strings because its parallelism is processes + NCCL.  On TPU the whole
assignment collapses to a `jax.sharding.Mesh` with named axes:

- ``dp``  — data parallel: envs, replay lanes, and sample batches are
  sharded along their B axis; gradient all-reduce is inserted by GSPMD
  over ICI (replaces DistributedDataParallel).
- ``mp``  — model/tensor parallel: large layers sharded over hidden dims
  (beyond reference parity — rlpyt has no model parallelism).

Everything runs under one jitted program; placing the carry with these
shardings is all that's needed — XLA propagates and inserts collectives.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass
class MeshSpec:
    """Declarative hardware mapping (replaces rlpyt affinity codes).

    ``dp``: data-parallel axis size (-1 = all remaining devices).
    ``mp``: model/tensor-parallel axis size.
    """

    dp: int = -1
    mp: int = 1

    def make(self, devices: Optional[Sequence[Any]] = None) -> Mesh:
        devices = list(devices if devices is not None else jax.devices())
        n = len(devices)
        dp = self.dp if self.dp > 0 else max(1, n // self.mp)
        assert dp * self.mp <= n, (
            f"mesh {dp}x{self.mp} needs {dp * self.mp} devices, have {n}")
        arr = np.array(devices[: dp * self.mp]).reshape(dp, self.mp)
        return Mesh(arr, ("dp", "mp"))


def make_mesh(dp: int = -1, mp: int = 1, devices=None) -> Mesh:
    return MeshSpec(dp=dp, mp=mp).make(devices)


# ---------------------------------------------------------------------------
# Sharding constructors.  Rule of thumb for rlpyt-shape states:
# rollout leaves are [B, ...] (batch axis 0); replay leaves are
# [size_T, B, ...] (batch axis 1); train/optimizer states are replicated
# (or tp-sharded via shard_params).

def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: int, ndim: int) -> NamedSharding:
    spec = [None] * ndim
    spec[axis] = "dp"
    return NamedSharding(mesh, P(*spec))


def _leaf_sharding(leaf, B: int, mesh: Mesh, axis: int) -> NamedSharding:
    shape = getattr(leaf, "shape", ())
    if len(shape) > axis and shape[axis] == B and B % mesh.shape["dp"] == 0:
        return batch_sharding(mesh, axis, len(shape))
    return replicated(mesh)


def shard_batch_tree(tree, B: int, mesh: Mesh, axis: int = 0):
    """Per-leaf NamedSharding pytree: 'dp' on ``axis`` where that dim == B,
    replicated otherwise (scalars, traj stats, cursors)."""
    return jax.tree.map(lambda l: _leaf_sharding(l, B, mesh, axis), tree)


def rollout_sharding(mesh: Mesh, rollout_state, B: int):
    """RolloutState → shardings: env/obs/prev/carry lanes split over dp."""
    return shard_batch_tree(rollout_state, B, mesh, axis=0)


def replay_sharding(mesh: Mesh, replay_state, B: int):
    """Replay states ([size_T, B, ...] rings, [n_slots, B] priorities) →
    lanes split over dp (replaces rlpyt's shared-memory replay: each dp
    shard owns B/dp collection lanes, exactly like rlpyt's per-process
    buffer slices, but with sampling collectives compiled by XLA)."""
    return shard_batch_tree(replay_state, B, mesh, axis=1)


def carry_sharding(mesh: Mesh, carry, B: int):
    """Shardings for a runners.train.TrainCarry."""
    from rlpyt_tpu.runners.train import TrainCarry  # cycle guard

    return TrainCarry(
        rollout_state=rollout_sharding(mesh, carry.rollout_state, B),
        train_state=jax.tree.map(lambda _: replicated(mesh),
                                 carry.train_state),
        replay_state=replay_sharding(mesh, carry.replay_state, B),
        algo_key=replicated(mesh),
    )


def put_global(tree, shardings):
    """device_put that also works when the mesh spans PROCESSES.

    Within one process this is ``jax.device_put``.  Across processes,
    ``device_put`` rejects non-addressable shardings — instead each
    process contributes its addressable shards via
    ``jax.make_array_from_callback``, relying on startup determinism:
    every process computed the SAME full host value (same seed → same
    carry), so slicing the local copy yields consistent global arrays.
    Typed PRNG-key leaves are unwrapped to their uint32 data and
    re-wrapped (numpy cannot view key dtypes)."""
    if jax.process_count() == 1:
        return jax.device_put(tree, shardings)

    def put(x, s: NamedSharding):
        if (hasattr(x, "dtype")
                and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key)):
            impl = jax.random.key_impl(x)
            data = np.asarray(jax.random.key_data(x))
            arr = jax.make_array_from_callback(
                data.shape, NamedSharding(s.mesh, s.spec),
                lambda idx: data[idx])
            return jax.random.wrap_key_data(arr, impl=impl)
        xd = np.asarray(x)
        return jax.make_array_from_callback(xd.shape, s,
                                            lambda idx: xd[idx])

    return jax.tree.map(put, tree, shardings)


# ---------------------------------------------------------------------------
# Multi-host (replaces rlpyt's single-node torch.distributed rendezvous,
# runners/sync_rl.py ~L100 + utils/synchronize.py:find_port).

def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Join the multi-host process group (jax.distributed.initialize).

    On TPU pods the arguments are discovered from the environment; pass
    them explicitly on other platforms.  Idempotent: safe to call when
    already initialized.  Returns this host's
    process index.  After this, ``jax.devices()`` is the GLOBAL device
    list and ``MeshSpec.make()`` builds pod-wide meshes; GSPMD compiles
    gradient/sampling collectives over ICI within a slice and DCN across
    slices."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        # Only "already initialized" is benign; a bad coordinator
        # address / process count must propagate, not be masked as a
        # single-process run.
        if "already initialized" not in str(e).lower():
            raise
    return jax.process_index()


def host_env_slice(B: int) -> slice:
    """Per-host lane range for HOST env farms under a dp-sharded global
    batch: process i owns lanes [i·B/H, (i+1)·B/H) (the analogue of
    rlpyt's n_envs_list worker split, samplers/parallel/base.py ~L60).
    On-device (jit-lockstep) envs need no split — GSPMD shards them."""
    n = jax.process_count()
    assert B % n == 0, f"global B={B} must divide over {n} hosts"
    per = B // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


# ---------------------------------------------------------------------------
# Tensor parallelism (beyond reference parity): column-shard dense/conv
# output dims over 'mp'.  XLA inserts the matching all-reduces.

def shard_params(params, mesh: Mesh, min_size: int = 1 << 16):
    """NamedSharding pytree for a flax params tree: 2D+ kernels with a
    large, mp-divisible output dim are column-sharded over 'mp'; everything
    else replicated.  With mp=1 this is all-replicated (pure dp)."""
    mp = mesh.shape["mp"]

    def rule(leaf):
        shape = getattr(leaf, "shape", ())
        if (mp > 1 and len(shape) >= 2 and shape[-1] % mp == 0
                and math.prod(shape) >= min_size):
            spec = [None] * (len(shape) - 1) + ["mp"]
            return NamedSharding(mesh, P(*spec))
        return replicated(mesh)

    return jax.tree.map(rule, params)
