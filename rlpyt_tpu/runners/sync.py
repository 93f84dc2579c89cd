"""Synchronous data-parallel training over a device mesh (reference:
rlpyt/runners/sync_rl.py:SyncRl/SyncRlEval ~L15-250).

rlpyt forks one process per GPU, each with its own sampler, wraps the
model in DistributedDataParallel over NCCL, and aligns iterations with
barriers; only rank 0 logs.  Here the SAME single-program runner as
MinibatchRl executes over an N-device mesh: the carry (env lanes, replay
lanes, sample batches) is sharded along its B axis on the 'dp' mesh axis,
params live replicated (or tensor-sharded over 'mp'), and GSPMD compiles
the gradient all-reduce onto ICI.  No worker processes, no barriers, no
DDP wrapper, no rank bookkeeping — and bitwise-identical math to the
single-device runner (same program, different layout).

Multi-host: call `jax.distributed.initialize()` first; the global mesh
spans all hosts' devices and each host feeds its own shard (envs are
functional so there is nothing host-local to feed at rlpyt scale).
"""
from __future__ import annotations

from typing import Optional, Union

import jax

from rlpyt_tpu.parallel.mesh import (MeshSpec, carry_sharding, put_global,
                                     shard_params)
from rlpyt_tpu.runners.train import MinibatchRl, TrainCarry


class SyncRl(MinibatchRl):
    """MinibatchRl with the interval program laid out over a mesh."""

    def __init__(self, *args, mesh: Optional[Union[MeshSpec, "jax.sharding.Mesh"]] = None,
                 **kwargs):
        super().__init__(*args, **kwargs)
        if mesh is None:
            mesh = MeshSpec(dp=-1, mp=1)
        self.mesh = mesh.make() if isinstance(mesh, MeshSpec) else mesh
        assert self.batch_spec.B % self.mesh.shape["dp"] == 0, (
            f"batch_B={self.batch_spec.B} must divide over "
            f"dp={self.mesh.shape['dp']}")

    def startup(self) -> TrainCarry:
        carry = super().startup()
        shardings = carry_sharding(self.mesh, carry, self.batch_spec.B)
        if self.mesh.shape["mp"] > 1 and hasattr(carry.train_state, "params"):
            updates = {"params": shard_params(carry.train_state.params,
                                              self.mesh)}
            if hasattr(carry.train_state, "target_params"):
                updates["target_params"] = shard_params(
                    carry.train_state.target_params, self.mesh)
            shardings = shardings._replace(
                train_state=shardings.train_state._replace(**updates))
        carry = put_global(carry, shardings)
        self._run_interval = jax.jit(
            self._interval_fn, donate_argnums=0,
            in_shardings=(shardings,),
            out_shardings=(shardings, None, None))
        return carry


class SyncRlEval(SyncRl):
    """(rlpyt/runners/sync_rl.py:SyncRlEval) — mesh runner + offline eval."""

    def __init__(self, *args, eval_env=None, **kwargs):
        if eval_env is None:
            raise ValueError("SyncRlEval requires eval_env")
        super().__init__(*args, eval_env=eval_env, **kwargs)
