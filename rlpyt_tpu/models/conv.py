"""Conv trunks (reference: rlpyt/models/conv2d.py:Conv2dModel,
Conv2dHeadModel ~L10).

Layout note: inputs arrive as [..., C, H, W] (rlpyt's torch layout, kept for
API parity) and are transposed to NHWC internally — the layout XLA:TPU
prefers for convolutions feeding the MXU.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from rlpyt_tpu.models.mlp import MlpModel


class Conv2dModel(nn.Module):
    channels: Sequence[int]
    kernel_sizes: Sequence[int]
    strides: Sequence[int]
    paddings: Optional[Sequence[int]] = None
    nonlinearity: Callable = nn.relu
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: [B, C, H, W] → [B, C_out, H', W'] (NCHW at the API surface)."""
        paddings = self.paddings or [0] * len(self.channels)
        x = jnp.transpose(x, (0, 2, 3, 1)).astype(self.compute_dtype)  # NHWC
        for ch, k, s, p in zip(self.channels, self.kernel_sizes,
                               self.strides, paddings):
            x = nn.Conv(ch, (k, k), strides=(s, s),
                        padding=[(p, p), (p, p)], dtype=self.compute_dtype)(x)
            x = self.nonlinearity(x)
        return jnp.transpose(x, (0, 3, 1, 2))

    @staticmethod
    def conv_out_size(channels, kernel_sizes, strides, paddings,
                      h: int, w: int) -> int:
        """Analytic output size (rlpyt/models/utils.py:conv2d_output_shape)."""
        paddings = paddings or [0] * len(channels)
        for k, s, p in zip(kernel_sizes, strides, paddings):
            h = (h + 2 * p - k) // s + 1
            w = (w + 2 * p - k) // s + 1
        return channels[-1] * h * w


class Conv2dHeadModel(nn.Module):
    """Conv stack + flatten + MLP head (rlpyt/models/conv2d.py:Conv2dHeadModel)."""

    channels: Sequence[int]
    kernel_sizes: Sequence[int]
    strides: Sequence[int]
    hidden_sizes: Sequence[int]
    paddings: Optional[Sequence[int]] = None
    output_size: Optional[int] = None
    nonlinearity: Callable = nn.relu
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv2dModel(self.channels, self.kernel_sizes, self.strides,
                        self.paddings, self.nonlinearity,
                        self.compute_dtype)(x)
        x = x.reshape(x.shape[0], -1)
        return MlpModel(self.hidden_sizes, self.output_size,
                        self.nonlinearity, self.compute_dtype)(x)
