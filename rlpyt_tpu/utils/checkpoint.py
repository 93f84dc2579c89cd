"""Checkpoint / resume (reference: rlpyt/runners/minibatch_rl.py:
get_itr_snapshot ~L200 + rlpyt/utils/logging/logger.py:save_itr_params).

The reference snapshots only {agent params, optimizer state}; replay
contents, env states, and RNG are lost, so resume is approximate.  Here
the ENTIRE TrainCarry — params, target/opt state, env states, replay
ring, RNG keys, cursors, step counters — is one pytree, so a checkpoint
is one tree write and resume is **bitwise deterministic**: a restored
run produces exactly the trajectories the original would have
(SURVEY.md §5.4 "beyond parity").

Format: pickled pytree of host numpy arrays (NamedTuple structure is
preserved by pickle), written atomically.  ``load_checkpoint`` can
re-place leaves onto the shardings of a template carry (multi-chip
resume onto a possibly different mesh).
"""
from __future__ import annotations

import os
import pickle
import tempfile
from typing import Any, Optional

import jax
import numpy as np


class _KeyLeaf:
    """Marker wrapping typed PRNG-key data (keys aren't numpy-convertible)."""

    def __init__(self, data: np.ndarray, impl: str):
        self.data = data
        self.impl = impl


def _to_host(leaf):
    if isinstance(leaf, jax.Array) and jax.dtypes.issubdtype(
            leaf.dtype, jax.dtypes.prng_key):
        impl = str(jax.random.key_impl(leaf))
        return _KeyLeaf(np.asarray(jax.random.key_data(leaf)), impl)
    return np.asarray(leaf)


def _from_host(leaf):
    if isinstance(leaf, _KeyLeaf):
        return jax.random.wrap_key_data(jax.numpy.asarray(leaf.data))
    return leaf


def save_checkpoint(path: str, carry: Any, metadata: Optional[dict] = None
                    ) -> None:
    """Atomically write ``carry`` (any pytree) + metadata to ``path``."""
    host = jax.tree.map(_to_host, carry)
    payload = {"carry": host, "metadata": metadata or {}}
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path: str, like: Any = None) -> tuple[Any, dict]:
    """Read a checkpoint.  With ``like`` (a live carry of the same
    structure), leaves are device_put onto ``like``'s shardings —
    resume works across mesh layouts."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    carry, metadata = payload["carry"], payload["metadata"]
    carry = jax.tree.map(_from_host, carry)
    if like is not None:
        def place(x, ref):
            s = getattr(ref, "sharding", None)
            return jax.device_put(x, s) if s is not None else (
                jax.numpy.asarray(x))

        carry = jax.tree.map(place, carry, like)
    else:
        carry = jax.tree.map(jax.numpy.asarray, carry)
    return carry, metadata
