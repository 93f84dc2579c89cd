"""Gym(nasium) space conversion (reference:
rlpyt/spaces/gym_wrapper.py:GymSpaceWrapper ~L10-120).

Maps gymnasium spaces onto the framework's spaces so host-bridged envs
(envs/host.py) expose the same ``EnvSpaces`` surface as JAX-native envs:
Box → FloatBox, Discrete → IntBox, Dict/Tuple → Composite.  dtype
coercion and ``null_value`` semantics follow the reference.
"""
from __future__ import annotations

import numpy as np

from rlpyt_tpu.spaces import Composite, FloatBox, IntBox, Space


def convert_gym_space(space) -> Space:
    import gymnasium.spaces as gs

    if isinstance(space, gs.Discrete):
        return IntBox(int(space.start), int(space.start + space.n))
    if isinstance(space, gs.Box):
        low = np.asarray(space.low)
        high = np.asarray(space.high)
        if np.issubdtype(space.dtype, np.integer):
            return IntBox(int(low.min()), int(high.max()) + 1,
                          shape=space.shape, dtype=np.dtype(space.dtype).name)
        return FloatBox(low, high, shape=space.shape)
    if isinstance(space, gs.Dict):
        return Composite({k: convert_gym_space(v)
                          for k, v in space.spaces.items()})
    if isinstance(space, gs.Tuple):
        return Composite({str(i): convert_gym_space(v)
                          for i, v in enumerate(space.spaces)})
    if isinstance(space, gs.MultiDiscrete):
        return IntBox(0, int(np.max(space.nvec)),
                      shape=(len(space.nvec),))
    raise NotImplementedError(f"gym space {type(space).__name__}")
