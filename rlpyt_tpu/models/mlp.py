"""MLP trunk (reference: rlpyt/models/mlp.py:MlpModel ~L10).

All dense layers run in a configurable compute dtype (bfloat16 by default on
TPU — MXU-native) with float32 parameters; outputs are cast back to float32
so losses/targets accumulate at full precision.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp


class MlpModel(nn.Module):
    hidden_sizes: Sequence[int]
    output_size: Optional[int] = None
    nonlinearity: Callable = nn.relu
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.compute_dtype)
        for h in self.hidden_sizes:
            x = nn.Dense(h, dtype=self.compute_dtype)(x)
            x = self.nonlinearity(x)
        if self.output_size is not None:
            x = nn.Dense(self.output_size, dtype=self.compute_dtype)(x)
        return x.astype(jnp.float32)
