"""MLP trunk (reference: rlpyt/models/mlp.py:MlpModel ~L10).

All dense layers run in a configurable compute dtype (bfloat16 by default on
TPU — MXU-native) with float32 parameters; outputs are cast back to float32
so losses/targets accumulate at full precision.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class BatchMinorInDense(nn.Module):
    """Dense layer consuming a BATCH-MINOR input [features, N] and
    emitting the conventional batch-major [N, features_out].

    The MXU contracts either operand orientation for free, so a
    batch-minor conv trunk (models/conv.py:BatchMinorConv) can feed the
    head without the [N, C*H*W]-sized relayout copy XLA otherwise
    inserts at the flatten.  Params are IDENTICAL to ``nn.Dense``
    (kernel [in, out] named 'kernel', bias 'bias', same default inits)
    — instantiated with ``name="Dense_i"`` it is checkpoint-compatible
    with the batch-major path."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[0], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        y = jax.lax.dot_general(
            x.astype(self.dtype), kernel.astype(self.dtype),
            (((0,), (0,)), ((), ())))           # [N, features]
        return y + bias.astype(self.dtype)


class MlpModel(nn.Module):
    hidden_sizes: Sequence[int]
    output_size: Optional[int] = None
    nonlinearity: Callable = nn.relu
    compute_dtype: jnp.dtype = jnp.float32
    # Input arrives batch-minor [features, N] (see BatchMinorInDense);
    # the first dense layer absorbs the orientation change.
    batch_minor_input: bool = False

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.compute_dtype)
        sizes = list(self.hidden_sizes)
        if self.output_size is not None:
            sizes.append(self.output_size)
        for i, h in enumerate(sizes):
            is_out = (self.output_size is not None and i == len(sizes) - 1)
            if i == 0 and self.batch_minor_input:
                x = BatchMinorInDense(h, dtype=self.compute_dtype,
                                      name=f"Dense_{i}")(x)
            else:
                x = nn.Dense(h, dtype=self.compute_dtype,
                             name=f"Dense_{i}")(x)
            if not is_out:
                x = self.nonlinearity(x)
        return x.astype(jnp.float32)
