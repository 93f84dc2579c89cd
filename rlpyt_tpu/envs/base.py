"""Environment interface (reference: rlpyt/envs/base.py:Env, EnvStep ~L5).

rlpyt's ``Env`` is a stateful object whose ``step`` crosses into C++
(ALE/MuJoCo) per call.  The TPU-native contract is *pure functional*:

    reset(key, params)                -> (state, obs)
    step(key, state, action, params)  -> (state, EnvStep)

so thousands of env instances run in lockstep under ``jax.vmap`` inside one
jitted rollout — replacing the entire Serial/Cpu/Gpu sampler process tree
(rlpyt/samplers/) with a single ``lax.scan``.  ``state`` is a pytree; all
randomness is keyed (counter-based), which gives exact fixed-seed trajectory
reproducibility regardless of how envs are sharded across chips/hosts.

``EnvStep(observation, reward, done, info)`` mirrors rlpyt's namedtuple; the
``info`` dict must have a *static schema* across steps (rlpyt's
EnvInfoWrapper enforced the same so buffers could be preallocated).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from rlpyt_tpu.spaces import Space


class EnvStep(NamedTuple):
    """One transition (rlpyt/envs/base.py:EnvStep)."""

    observation: Any
    reward: jax.Array
    done: jax.Array
    info: Dict[str, jax.Array]


class EnvSpaces(NamedTuple):
    """(rlpyt/envs/base.py:EnvSpaces)."""

    observation: Space
    action: Space


class Env:
    """Pure-functional environment.  Subclasses are stateless; all mutable
    state lives in the ``state`` pytree threaded by the caller."""

    # Static per-env default params; subclasses may override or accept a
    # params pytree to vmap over (domain randomization).
    def default_params(self):
        return None

    @property
    def observation_space(self) -> Space:
        raise NotImplementedError

    @property
    def action_space(self) -> Space:
        raise NotImplementedError

    @property
    def spaces(self) -> EnvSpaces:
        return EnvSpaces(self.observation_space, self.action_space)

    # Optional episode cap enforced by the env itself; None = unbounded.
    # TimeLimit wrapping (with `timeout` in info) is in wrappers.py.
    @property
    def horizon(self):
        return None

    def reset(self, key: jax.Array, params=None) -> Tuple[Any, jax.Array]:
        raise NotImplementedError

    def step(self, key: jax.Array, state, action, params=None
             ) -> Tuple[Any, EnvStep]:
        raise NotImplementedError

    # ------------------------------------------------------------------
    # Convenience: batched reset/step via vmap (used by rollout engine).
    # ------------------------------------------------------------------

    def reset_batch(self, key: jax.Array, n: int, params=None):
        keys = jax.random.split(key, n)
        return jax.vmap(self.reset, in_axes=(0, None))(keys, params)

    def step_batch(self, key: jax.Array, state, action, params=None):
        n = jax.tree.leaves(state)[0].shape[0]
        keys = jax.random.split(key, n)
        return jax.vmap(self.step, in_axes=(0, 0, 0, None))(
            keys, state, action, params)

    def example_info(self) -> Dict[str, jax.Array]:
        """Static info schema used to preallocate buffers."""
        return {}
