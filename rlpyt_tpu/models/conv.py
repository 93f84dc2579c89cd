"""Conv trunks (reference: rlpyt/models/conv2d.py:Conv2dModel,
Conv2dHeadModel ~L10).

Layout note: inputs arrive as [..., C, H, W] (rlpyt's torch layout, kept for
API parity) and are transposed to NHWC internally — the layout XLA:TPU
prefers for convolutions feeding the MXU.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rlpyt_tpu.models.mlp import MlpModel


class BatchMinorConv(nn.Module):
    """Convolution computing in a BATCH-MINOR data layout: input
    ``[*spatial, C, N]`` → output ``[*spatial', features, N]``.

    XLA:TPU's conv emitters want batch in the minor (lane) dimension at
    large batch (the optimized HLO shows ``EmitInputBatchInLanes`` /
    batch-last ``f012b`` dim labels); feeding them the conventional
    batch-major layout makes layout assignment materialize a bf16
    relayout copy of every activation (2×~0.45 ms/update at the
    flagship geometry, profiles/flagship_profile_B1024.json top_ops
    copy.170/copy.172).  Expressing the trunk batch-minor lets the
    (cheaper, uint8) layout change happen before the convert and the
    convert+scale fuse into the conv's input.

    Parameters are IDENTICAL to ``nn.Conv`` (kernel ``[*k, in, out]``
    named 'kernel', bias 'bias', same default inits) — instantiated
    with ``name="Conv_i"`` it is checkpoint-compatible with the
    batch-major path, so one set of params serves both."""

    features: int
    kernel_size: Tuple[int, ...]
    strides: Tuple[int, ...]
    padding: Any = "VALID"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        nd = len(self.kernel_size)
        in_features = x.shape[-2]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            tuple(self.kernel_size) + (in_features, self.features),
            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        spat = "DHW"[3 - nd:]
        dn = (spat + "CN", spat + "IO", spat + "CN")
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=tuple(self.strides), padding=self.padding,
            dimension_numbers=dn)
        return y + bias.astype(self.dtype)[:, None]


class Conv2dModel(nn.Module):
    channels: Sequence[int]
    kernel_sizes: Sequence[int]
    strides: Sequence[int]
    paddings: Optional[Sequence[int]] = None
    nonlinearity: Callable = nn.relu
    compute_dtype: jnp.dtype = jnp.float32
    # Fold the first layer's stride-s blocks into channels when the
    # geometry allows (k % s == 0, p == 0, H,W % s == 0): a stride-s kxk
    # conv over C channels is EXACTLY a stride-1 (k/s)x(k/s) conv over
    # s*s*C channels of the space-to-depth input.  On TPU this lifts the
    # first layer's input-feature dim from C (e.g. 4 stacked frames —
    # a few % of the 128-wide MXU contraction lanes) to s*s*C (64),
    # where the MXU runs at full tilt.  Same FLOPs, same fan-in (so the
    # default lecun init distribution is unchanged), same math.  The
    # NCHW→blocked permute happens in the INPUT dtype (uint8 frames stay
    # uint8) as one combined transpose replacing the NCHW→NHWC one, so
    # the layout change costs half the plain path's relayout traffic
    # rather than adding a bf16 transpose per pass.
    space_to_depth: bool = False
    # Multiply inputs by this after the layout change, in compute dtype
    # (lets callers keep obs uint8 through the transpose and fold the
    # 1/255 scaling into the conv's fused epilogue).
    input_scale: float = 1.0
    # Input is ALREADY the batch-minor space-to-depth conv layout
    # [C, H/s, W/s, s*s, N] — produced by the blocked replay sample
    # path (replay/frame.py:_obs_pair_blocked, BlockedFrames).  Same
    # params as the space_to_depth raw path.
    pre_blocked: bool = False
    # When the s2d batch-minor trunk engages, return the flattened
    # features STILL batch-minor as 2-D [C*H'*W', N] (flatten order
    # (C, H', W'), matching the NCHW reshape) so the head's first
    # dense layer can contract it directly (mlp.py:BatchMinorInDense)
    # — no [N, C*H'*W']-sized relayout copy.  When the s2d path does
    # not engage, output stays 4-D NCHW (callers branch on ndim).
    batch_minor_out: bool = False

    @nn.compact
    def __call__(self, x):
        """x: [B, C, H, W] → [B, C_out, H', W'] (NCHW at the API surface)."""
        paddings = self.paddings or [0] * len(self.channels)
        k0, s0, p0 = (self.kernel_sizes[0], self.strides[0], paddings[0])
        if self.pre_blocked:
            assert self.space_to_depth and s0 > 1 and k0 % s0 == 0 \
                and p0 == 0, "pre_blocked needs an s2d-able first layer"
            use_s2d = True
        else:
            use_s2d = (self.space_to_depth and s0 > 1 and k0 % s0 == 0
                       and p0 == 0 and x.shape[2] % s0 == 0
                       and x.shape[3] % s0 == 0)
        if self.pre_blocked:
            pass           # already [C, Hb, Wb, s*s, N] batch-minor
        elif use_s2d:
            # Per-frame blocking only (dy past Wb) — the SAME permute
            # block_frame_rows applies at replay insert, so the blocked
            # replay path reaches this point with pure reshapes and the
            # K frames never need interleaving into one channel axis:
            # the first layer is a 3D conv whose leading spatial window
            # spans the C(=frame) axis.
            B, C, H, W = x.shape
            x = x.reshape(B, C, H // s0, s0, W // s0, s0)
            x = x.transpose(0, 1, 2, 4, 3, 5)   # [B, C, Hb, Wb, dy, dx]
            x = x.reshape(B, C, H // s0, W // s0, s0 * s0)
        else:
            x = jnp.transpose(x, (0, 2, 3, 1))   # NHWC
        if use_s2d and not self.pre_blocked:
            # Batch-minor trunk: move N to the minor axis while still in
            # the INPUT dtype (uint8 — half the relayout bytes of the
            # bf16 copies XLA otherwise inserts to reach its preferred
            # batch-in-lanes conv layout), convert after, and run every
            # layer through BatchMinorConv (explicit names keep the
            # param tree identical to the nn.Conv path).  The
            # pre_blocked replay path arrives ALREADY batch-minor
            # (replay/frame.py materializes the uint8 transpose behind
            # an optimization barrier).
            x = x.transpose(1, 2, 3, 4, 0)       # [C, Hb, Wb, ss, N]
        x = x.astype(self.compute_dtype)
        if self.input_scale != 1.0:
            x = x * jnp.asarray(self.input_scale, self.compute_dtype)
        for i, (ch, k, s, p) in enumerate(zip(
                self.channels, self.kernel_sizes, self.strides, paddings)):
            if i == 0 and use_s2d:
                # x: [C, Hb, Wb, s*s, N] = DHWCN with D=C frames.
                # Window (C, k/s, k/s) stride 1 VALID collapses the
                # frame axis — exactly the original stride-s kxk conv
                # over C channels (kernel re-blocked; same fan-in).
                C = x.shape[0]
                x = BatchMinorConv(
                    ch, (C, k // s, k // s), strides=(1, 1, 1),
                    padding="VALID", dtype=self.compute_dtype,
                    name="Conv_0")(x)
                x = x.reshape(x.shape[1], x.shape[2], ch, x.shape[-1])
            elif use_s2d:
                x = BatchMinorConv(
                    ch, (k, k), strides=(s, s),
                    padding=[(p, p), (p, p)], dtype=self.compute_dtype,
                    name=f"Conv_{i}")(x)
            else:
                x = nn.Conv(ch, (k, k), strides=(s, s),
                            padding=[(p, p), (p, p)],
                            dtype=self.compute_dtype)(x)
            x = self.nonlinearity(x)
        if use_s2d:
            if self.batch_minor_out:
                H2, W2, C2, N = x.shape
                return x.transpose(2, 0, 1, 3).reshape(C2 * H2 * W2, N)
            return jnp.transpose(x, (3, 2, 0, 1))   # [H,W,C,N] → NCHW
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
