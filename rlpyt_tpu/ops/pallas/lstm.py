"""Fused LSTM sequence kernel (Pallas TPU).

The R2D1 / recurrent-PG hot path (reference:
rlpyt/models/dqn/atari_r2d1_model.py's torch.nn.LSTM over [T, B, ·]) is a
T-step recurrence.  Under a plain ``lax.scan`` XLA re-streams the weight
matrices from HBM every step; for R2D1's [F≈512, 4H=2048] matrices over
T=120-step windows that is ~100× more weight traffic than necessary.
This kernel pins W_x/W_h/bias in VMEM for the whole sequence (grid over
T, weights blocked whole), carries (h, c) in VMEM scratch, and fuses the
per-step done-reset masking (rlpyt RecurrentAgentMixin.reset_one
semantics) into the same program.  A custom VJP runs the matching
reverse-time kernel with dW accumulators in VMEM scratch.

Layout: gates are [B, 4·Hp] with per-gate segments [i | f | g | o] at
multiples of Hp (H padded to the 128-lane boundary); B padded to the
8-sublane boundary; F padded to 128.  Padded weight rows/cols are zero,
so padded lanes never leak into real outputs (padded gate lanes do carry
garbage h/c values, but the zero rows of W_h keep them out of real
gates, and callers slice [:H]).

Reference jnp implementation: ``lstm_scan`` below — the two paths are
compared (fwd + grads) in tests/test_pallas_lstm.py.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ===========================================================================
# Reference path (jnp scan) — also the non-TPU fallback
# ===========================================================================

def lstm_scan(wx, wh, b, x, done, h0, c0):
    """LSTM over [T, B, F] with per-step done reset; gate order i,f,g,o.

    Returns (y [T, B, H], (hT, cT))."""
    H = wh.shape[0]

    def step(carry, inp):
        h, c = carry
        xt, dt = inp
        mask = (~dt).astype(h.dtype)[:, None]
        h, c = h * mask, c * mask
        gates = xt @ wx + h @ wh + b
        i = jax.nn.sigmoid(gates[:, 0 * H:1 * H])
        f = jax.nn.sigmoid(gates[:, 1 * H:2 * H])
        g = jnp.tanh(gates[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H:4 * H])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    (hT, cT), y = jax.lax.scan(step, (h0, c0), (x, done))
    return y, (hT, cT)


# ===========================================================================
# Forward kernel
# ===========================================================================

def _fwd_kernel(x_ref, mask_ref, wx_ref, wh_ref, b_ref, h0_ref, c0_ref,
                y_ref, gates_ref, cs_ref, hT_ref, cT_ref, h_s, c_s,
                *, Hp: int):
    t = pl.program_id(0)
    T = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        h_s[:] = h0_ref[:]
        c_s[:] = c0_ref[:]

    # mask_ref is the full [T, B] (1 - done) array in VMEM (tiny); a
    # (1, B) per-step block violates the (8, 128) tiling rule on TPU.
    mask = mask_ref[t, :][:, None]                             # [B, 1]
    h = h_s[:] * mask
    c = c_s[:] * mask
    gates = (
        jnp.dot(x_ref[0], wx_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(h, wh_ref[:], preferred_element_type=jnp.float32)
        + b_ref[0][None, :])
    i = jax.nn.sigmoid(gates[:, 0 * Hp:1 * Hp])
    f = jax.nn.sigmoid(gates[:, 1 * Hp:2 * Hp])
    g = jnp.tanh(gates[:, 2 * Hp:3 * Hp])
    o = jax.nn.sigmoid(gates[:, 3 * Hp:4 * Hp])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    y_ref[0] = h_new
    gates_ref[0] = jnp.concatenate([i, f, g, o], axis=1)
    cs_ref[0] = c_new
    h_s[:] = h_new
    c_s[:] = c_new

    @pl.when(t == T - 1)
    def _():
        hT_ref[:] = h_new
        cT_ref[:] = c_new


def _lstm_fwd_pallas(wx, wh, b, x, done, h0, c0, *, interpret: bool):
    T, B, F = x.shape
    H = wh.shape[0]
    Bp, Fp, Hp = _round_up(B, 8), _round_up(F, 128), _round_up(H, 128)

    xp = jnp.pad(x, ((0, 0), (0, Bp - B), (0, Fp - F)))
    maskf = jnp.pad(1.0 - done.astype(jnp.float32),
                    ((0, 0), (0, Bp - B)))
    # per-gate segments padded independently: [F,4H] → [Fp, 4Hp]
    wxp = jnp.pad(wx.reshape(F, 4, H),
                  ((0, Fp - F), (0, 0), (0, Hp - H))).reshape(Fp, 4 * Hp)
    whp = jnp.pad(wh.reshape(H, 4, H),
                  ((0, Hp - H), (0, 0), (0, Hp - H))).reshape(Hp, 4 * Hp)
    bp = jnp.pad(b.reshape(4, H), ((0, 0), (0, Hp - H))).reshape(1, 4 * Hp)
    h0p = jnp.pad(h0, ((0, Bp - B), (0, Hp - H)))
    c0p = jnp.pad(c0, ((0, Bp - B), (0, Hp - H)))

    step_spec = lambda width: pl.BlockSpec(  # noqa: E731
        (1, Bp, width), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731

    y, gates, cs, hT, cT = pl.pallas_call(
        functools.partial(_fwd_kernel, Hp=Hp),
        grid=(T,),
        in_specs=[
            step_spec(Fp),
            full(),   # mask [T, B] whole-array
            full(), full(), full(), full(), full(),
        ],
        out_specs=(step_spec(Hp), step_spec(4 * Hp), step_spec(Hp),
                   pl.BlockSpec((Bp, Hp), lambda t: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((Bp, Hp), lambda t: (0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((T, Bp, Hp), jnp.float32),
            jax.ShapeDtypeStruct((T, Bp, 4 * Hp), jnp.float32),
            jax.ShapeDtypeStruct((T, Bp, Hp), jnp.float32),
            jax.ShapeDtypeStruct((Bp, Hp), jnp.float32),
            jax.ShapeDtypeStruct((Bp, Hp), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((Bp, Hp), jnp.float32),
                        pltpu.VMEM((Bp, Hp), jnp.float32)],
        interpret=interpret,
    )(xp, maskf, wxp, whp, bp, h0p, c0p)
    return (y, gates, cs, hT, cT), (Bp, Fp, Hp)


# ===========================================================================
# Backward kernel (reverse-time grid)
# ===========================================================================
#
# VMEM budget note: accumulating dWx/dWh in kernel scratch needs
# 2·[F,4H]+2·[H,4H] f32 resident (≈16 MB at F=H=512) and OOMs scoped
# VMEM.  Instead the kernel only runs the *sequential* part — per-step
# dgates and the (dh, dc) recurrence, which needs just W_h resident —
# and the embarrassingly-parallel contractions (dx, dWx, dWh, db) run
# as big XLA batch matmuls over the emitted dgates afterwards.

def _bwd_kernel(mask_ref, gates_ref, c_ref, cprev_ref, dy_ref, wh_ref,
                c0_ref, dcT_ref,
                dgates_ref, dh0_ref, dc0_ref,
                dh_s, dc_s, *, Hp: int):
    t = pl.program_id(0)
    T = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        dh_s[:] = jnp.zeros_like(dh_s)
        dc_s[:] = dcT_ref[:]

    mask = mask_ref[(T - 1) - t, :][:, None]
    is_s0 = (t == T - 1)
    cp = jnp.where(is_s0, c0_ref[:], cprev_ref[0])
    cp_m = cp * mask

    gates = gates_ref[0]
    i = gates[:, 0 * Hp:1 * Hp]
    f = gates[:, 1 * Hp:2 * Hp]
    g = gates[:, 2 * Hp:3 * Hp]
    o = gates[:, 3 * Hp:4 * Hp]
    tanh_c = jnp.tanh(c_ref[0])

    dh = dy_ref[0] + dh_s[:]
    do_pre = dh * tanh_c * o * (1.0 - o)
    dct = dh * o * (1.0 - tanh_c * tanh_c) + dc_s[:]
    di_pre = dct * g * i * (1.0 - i)
    dg_pre = dct * i * (1.0 - g * g)
    df_pre = dct * cp_m * f * (1.0 - f)
    dcp = dct * f
    dgates = jnp.concatenate([di_pre, df_pre, dg_pre, do_pre], axis=1)
    dgates_ref[0] = dgates

    dhp = jax.lax.dot_general(
        dgates, wh_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh_s[:] = dhp * mask
    dc_s[:] = dcp * mask

    @pl.when(t == T - 1)
    def _():
        dh0_ref[:] = dh_s[:]
        dc0_ref[:] = dc_s[:]


def _lstm_bwd_pallas(res, grads, *, interpret: bool):
    (wxp, whp, h0p, c0p, xp, maskf, y, gates, cs, dims, shapes) = res
    (T, B, F, H) = shapes
    Bp, Fp, Hp = dims
    dy, dhT, dcT = grads

    dyp = jnp.pad(dy, ((0, 0), (0, Bp - B), (0, Hp - H)))
    # hT's cotangent enters exactly like dy at the last step (dh = dy[t] +
    # dh_carry), so it folds into dyp[-1]; cT's cotangent rides the dc
    # carry instead and seeds dc_s inside the kernel (dcT input below).
    dyp = dyp.at[-1].add(jnp.pad(dhT, ((0, Bp - B), (0, Hp - H))))
    dcTp = jnp.pad(dcT, ((0, Bp - B), (0, Hp - H)))

    rev = lambda t: ((T - 1) - t, 0, 0)        # noqa: E731
    rev_prev = lambda t: (jnp.maximum((T - 1) - t - 1, 0), 0, 0)  # noqa: E731
    step = lambda w, imap: pl.BlockSpec(       # noqa: E731
        (1, Bp, w), imap, memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731

    dgates, dh0, dc0 = pl.pallas_call(
        functools.partial(_bwd_kernel, Hp=Hp),
        grid=(T,),
        in_specs=[
            full(),                                          # mask [T, B]
            step(4 * Hp, rev),                               # gates
            step(Hp, rev),                                   # c
            step(Hp, rev_prev),                              # c_prev
            step(Hp, rev),                                   # dy
            full(), full(), full(),                          # wh c0 dcT
        ],
        out_specs=(step(4 * Hp, rev), full(), full()),
        out_shape=(
            jax.ShapeDtypeStruct((T, Bp, 4 * Hp), jnp.float32),
            jax.ShapeDtypeStruct((Bp, Hp), jnp.float32),
            jax.ShapeDtypeStruct((Bp, Hp), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((Bp, Hp), jnp.float32),
                        pltpu.VMEM((Bp, Hp), jnp.float32)],
        interpret=interpret,
    )(maskf, gates, cs, cs, dyp, whp, c0p, dcTp)

    # Parallel contractions over the whole window (MXU-friendly [T·B]
    # reductions — XLA handles these better than serialized accumulation).
    hprev = jnp.concatenate([h0p[None], y[:-1]], axis=0)
    hprev_m = hprev * maskf[:, :, None]
    dx = jnp.einsum("tbg,fg->tbf", dgates, wxp)
    dwx = jnp.einsum("tbf,tbg->fg", xp, dgates)
    dwh = jnp.einsum("tbh,tbg->hg", hprev_m, dgates)
    db = jnp.sum(dgates, axis=(0, 1))

    dwx = dwx.reshape(Fp, 4, Hp)[:F, :, :H].reshape(F, 4 * H)
    dwh = dwh.reshape(Hp, 4, Hp)[:H, :, :H].reshape(H, 4 * H)
    db = db.reshape(4, Hp)[:, :H].reshape(4 * H)
    return (dwx, dwh, db, dx[:, :B, :F], None,
            dh0[:B, :H], dc0[:B, :H])


# ===========================================================================
# custom_vjp wrapper
# ===========================================================================

@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def lstm_pallas(wx, wh, b, x, done, h0, c0, interpret=False):
    """Fused-LSTM forward: same contract as ``lstm_scan``."""
    (y, _, _, hT, cT), (Bp, _, Hp) = _lstm_fwd_pallas(
        wx, wh, b, x, done, h0, c0, interpret=interpret)
    B, H = h0.shape
    return y[:, :B, :H], (hT[:B, :H], cT[:B, :H])


def _vjp_fwd(wx, wh, b, x, done, h0, c0, interpret):
    (y, gates, cs, hT, cT), dims = _lstm_fwd_pallas(
        wx, wh, b, x, done, h0, c0, interpret=interpret)
    T, B, F = x.shape
    H = h0.shape[1]
    Bp, Fp, Hp = dims
    xp = jnp.pad(x, ((0, 0), (0, Bp - B), (0, Fp - F)))
    maskf = jnp.pad(1.0 - done.astype(jnp.float32),
                    ((0, 0), (0, Bp - B)))
    wxp = jnp.pad(wx.reshape(F, 4, H),
                  ((0, Fp - F), (0, 0), (0, Hp - H))).reshape(Fp, 4 * Hp)
    whp = jnp.pad(wh.reshape(H, 4, H),
                  ((0, Hp - H), (0, 0), (0, Hp - H))).reshape(Hp, 4 * Hp)
    h0p = jnp.pad(h0, ((0, Bp - B), (0, Hp - H)))
    c0p = jnp.pad(c0, ((0, Bp - B), (0, Hp - H)))
    res = (wxp, whp, h0p, c0p, xp, maskf, y, gates, cs, dims,
           (T, B, F, H))
    return (y[:, :B, :H], (hT[:B, :H], cT[:B, :H])), res


def _vjp_bwd(interpret, res, grads):
    dy, (dhT, dcT) = grads
    return _lstm_bwd_pallas(res, (dy, dhT, dcT), interpret=interpret)


lstm_pallas.defvjp(_vjp_fwd, _vjp_bwd)
