"""Recurrent core shared by LSTM agents (reference: the LSTM usage inside
rlpyt/models/dqn/atari_r2d1_model.py and rlpyt/models/pg/atari_lstm_model.py).

One module serves both the sampler (single step, lead_dim<=1) and training
(lead_dim==2: T-major sequence).  Per-env ``done`` flags zero the carried
state *before* each step, matching rlpyt's RecurrentAgentMixin.reset_one
semantics (rlpyt/agents/base.py ~L250) so episode boundaries inside a
training window cut the recurrence.

Two sequence implementations over the same parameters:
- ``impl="scan"`` — ``lax.scan`` of the cell (default; GSPMD-shardable);
- ``impl="pallas"`` — the fused TPU kernel (ops/pallas/lstm.py): weights
  pinned in VMEM for the whole window, done-reset fused, custom VJP.
  Select via model kwarg for single-chip hot loops (GSPMD cannot
  auto-partition a pallas_call).  ``impl="pallas_interpret"`` runs the
  same kernel in interpreter mode (CPU tests).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rlpyt_tpu.ops.pallas.lstm import lstm_pallas, lstm_scan

RnnState = Tuple[jax.Array, jax.Array]  # (h, c), each [B, hidden]


def zero_rnn_state(batch_shape: tuple, hidden_size: int,
                   dtype=jnp.float32) -> RnnState:
    shape = tuple(batch_shape) + (hidden_size,)
    return (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


class LstmCore(nn.Module):
    """LSTM over [T, B, F] inputs with per-step done masking.

    ``__call__(x, done, state)``:
      x:     [T, B, F]
      done:  [T, B] — True at step t resets the state used FOR step t
             (i.e. done[t] marks that x[t] is the first obs of a new episode).
      state: (h, c) with shape [B, H]
    Returns (y [T, B, H], final_state).
    """

    hidden_size: int
    impl: str = "scan"   # "scan" | "pallas" | "pallas_interpret"

    @nn.compact
    def __call__(self, x, done, state):
        F = x.shape[-1]
        H = self.hidden_size

        def per_gate(init, gate_shape):
            def f(key, shape, dtype=jnp.float32):
                ks = jax.random.split(key, 4)
                return jnp.concatenate(
                    [init(k, gate_shape, dtype) for k in ks], axis=-1)
            return f

        # Per-gate init matching the flax LSTM cells: lecun_normal input
        # kernels, orthogonal [H, H] recurrent kernels, zero bias.
        wx = self.param("wx", per_gate(nn.initializers.lecun_normal(),
                                       (F, H)), (F, 4 * H))
        wh = self.param("wh", per_gate(nn.initializers.orthogonal(),
                                       (H, H)), (H, 4 * H))
        b = self.param("b", nn.initializers.zeros_init(), (4 * H,))
        h0, c0 = state
        if self.impl == "scan":
            return lstm_scan(wx, wh, b, x, done, h0, c0)
        interpret = self.impl == "pallas_interpret"
        y, (hT, cT) = lstm_pallas(wx, wh, b, x, done, h0, c0, interpret)
        return y, (hT, cT)
