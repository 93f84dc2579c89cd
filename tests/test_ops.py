"""Golden-value tests for the return/advantage/value math
(rlpyt_tpu/ops/) against straightforward reference loops — the unit
coverage the reference lacks (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlpyt_tpu.ops.returns import (
    discount_return,
    discount_return_n_step,
    generalized_advantage_estimation,
    valid_from_done,
)
from rlpyt_tpu.ops.value import (
    categorical_projection,
    huber_loss,
    polyak_update,
    value_rescale,
    value_rescale_inv,
)

T, B = 17, 5
rng = np.random.RandomState(42)
REW = rng.randn(T, B).astype(np.float32)
VAL = rng.randn(T, B).astype(np.float32)
DONE = (rng.rand(T, B) < 0.2)
BV = rng.randn(B).astype(np.float32)


def ref_discount_return(reward, done, bv, gamma):
    out = np.zeros_like(reward)
    ret = bv.copy()
    for t in reversed(range(reward.shape[0])):
        nd = 1.0 - done[t]
        ret = reward[t] + gamma * nd * ret
        out[t] = ret
    return out


def ref_gae(reward, value, done, bv, gamma, lam):
    adv = np.zeros_like(reward)
    gae = np.zeros(reward.shape[1], np.float32)
    next_v = bv.copy()
    for t in reversed(range(reward.shape[0])):
        nd = 1.0 - done[t]
        delta = reward[t] + gamma * next_v * nd - value[t]
        gae = delta + gamma * lam * nd * gae
        adv[t] = gae
        next_v = value[t]
    return adv


def test_discount_return_matches_loop():
    ours = discount_return(jnp.asarray(REW), jnp.asarray(DONE),
                           jnp.asarray(BV), 0.99)
    ref = ref_discount_return(REW, DONE.astype(np.float32), BV, 0.99)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)


def test_gae_matches_loop():
    adv, ret = generalized_advantage_estimation(
        jnp.asarray(REW), jnp.asarray(VAL), jnp.asarray(DONE),
        jnp.asarray(BV), 0.99, 0.95)
    ref_adv = ref_gae(REW, VAL, DONE.astype(np.float32), BV, 0.99, 0.95)
    np.testing.assert_allclose(np.asarray(adv), ref_adv, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ret), ref_adv + VAL, rtol=1e-4,
                               atol=1e-5)


def test_n_step_return_matches_loop():
    n, gamma = 4, 0.9
    ours_ret, ours_done = discount_return_n_step(
        jnp.asarray(REW), jnp.asarray(DONE), n, gamma)
    out_T = T - n + 1
    for t in range(out_T):
        ret, dn, live = 0.0, False, 1.0
        for k in range(n):
            ret += (gamma ** k) * REW[t + k] * live
            dn = dn | DONE[t + k]
            live = live * (1.0 - DONE[t + k])
        np.testing.assert_allclose(np.asarray(ours_ret[t]), ret, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(ours_done[t]), dn)


def test_valid_from_done():
    done = jnp.array([[0, 0], [1, 0], [0, 0], [0, 1], [0, 0]], jnp.bool_)
    valid = valid_from_done(done)
    np.testing.assert_array_equal(
        np.asarray(valid),
        [[1, 1], [1, 1], [0, 1], [0, 1], [0, 0]])


def test_huber():
    d = jnp.array([-3.0, -0.5, 0.0, 0.5, 2.0])
    out = huber_loss(d, 1.0)
    np.testing.assert_allclose(
        np.asarray(out), [2.5, 0.125, 0.0, 0.125, 1.5], rtol=1e-6)


def test_categorical_projection_identity():
    """Zero reward + γ=1 projection of an on-support dist is identity."""
    z = jnp.linspace(-10, 10, 51)
    p = jax.nn.softmax(jnp.asarray(rng.randn(3, 51).astype(np.float32)))
    out = categorical_projection(
        p, jnp.zeros(3), jnp.ones(3), z, discount_n=1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(p), atol=1e-5)


def test_categorical_projection_terminal():
    """Terminal transitions project a point mass at the clipped return."""
    z = jnp.linspace(-10, 10, 51)
    p = jax.nn.softmax(jnp.asarray(rng.randn(1, 51).astype(np.float32)))
    out = categorical_projection(
        p, jnp.array([0.0]), jnp.zeros(1), z, discount_n=0.99)
    # return 0 lands exactly on atom 25
    assert float(out[0, 25]) == pytest.approx(1.0, abs=1e-5)
    assert float(out.sum()) == pytest.approx(1.0, abs=1e-5)


def test_categorical_projection_probability_mass():
    z = jnp.linspace(-5, 5, 21)
    p = jax.nn.softmax(jnp.asarray(rng.randn(7, 21).astype(np.float32)))
    out = categorical_projection(
        p, jnp.asarray(rng.randn(7).astype(np.float32) * 3),
        jnp.ones(7), z, discount_n=0.97)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), np.ones(7),
                               atol=1e-5)


def test_value_rescale_roundtrip():
    x = jnp.linspace(-100, 100, 201)
    back = value_rescale_inv(value_rescale(x))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-4,
                               atol=5e-3)


def test_polyak():
    t = {"w": jnp.zeros(3)}
    o = {"w": jnp.ones(3)}
    out = polyak_update(t, o, 0.1)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1 * np.ones(3))
    hard = polyak_update(t, o, 1.0)
    np.testing.assert_allclose(np.asarray(hard["w"]), np.ones(3))
