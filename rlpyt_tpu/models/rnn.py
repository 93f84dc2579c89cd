"""Recurrent core shared by LSTM agents (reference: the LSTM usage inside
rlpyt/models/dqn/atari_r2d1_model.py and rlpyt/models/pg/atari_lstm_model.py).

One module serves both the sampler (single step, lead_dim<=1) and training
(lead_dim==2: ``lax.scan`` over T).  Per-env ``done`` flags zero the carried
state *before* each step, matching rlpyt's RecurrentAgentMixin.reset_one
semantics (rlpyt/agents/base.py ~L250) so episode boundaries inside a
training window cut the recurrence.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

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

    @nn.compact
    def __call__(self, x, done, state):
        cell = nn.OptimizedLSTMCell(self.hidden_size)

        def step(cell, carry, inputs):
            xt, dt = inputs
            mask = (~dt).astype(xt.dtype)[:, None]
            carry = jax.tree.map(lambda c: c * mask, carry)
            carry, y = cell(carry, xt)
            return carry, y

        scan = nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False})
        # flax LSTMCell carry is (c, h); we expose (h, c) externally for
        # parity with the (q, prev_rnn_state) layout stored in replay.
        carry = (state[1], state[0])
        carry, y = scan(cell, carry, (x, done))
        return y, (carry[1], carry[0])
