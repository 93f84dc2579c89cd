"""Pallas fused-LSTM kernel vs the jnp scan reference (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlpyt_tpu.ops.pallas.lstm import lstm_pallas, lstm_scan


def make_inputs(key, T, B, F, H, with_dones=True):
    ks = jax.random.split(key, 8)
    wx = jax.random.normal(ks[0], (F, 4 * H)) * 0.3
    wh = jax.random.normal(ks[1], (H, 4 * H)) * 0.3
    b = jax.random.normal(ks[2], (4 * H,)) * 0.1
    x = jax.random.normal(ks[3], (T, B, F))
    done = (jax.random.uniform(ks[4], (T, B)) < 0.15) if with_dones \
        else jnp.zeros((T, B), bool)
    h0 = jax.random.normal(ks[5], (B, H)) * 0.5
    c0 = jax.random.normal(ks[6], (B, H)) * 0.5
    return wx, wh, b, x, done, h0, c0


@pytest.mark.parametrize("shape", [(5, 4, 8, 16), (7, 3, 130, 100)])
def test_forward_matches_scan(shape):
    T, B, F, H = shape
    args = make_inputs(jax.random.key(0), T, B, F, H)
    y_ref, (h_ref, c_ref) = lstm_scan(*args)
    y, (h, c) = lstm_pallas(*args, True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_scan():
    T, B, F, H = 6, 4, 12, 20
    args = make_inputs(jax.random.key(1), T, B, F, H)
    key = jax.random.key(2)
    gy = jax.random.normal(key, (T, B, H))
    ghT = jax.random.normal(jax.random.key(3), (B, H))
    gcT = jax.random.normal(jax.random.key(4), (B, H))

    def loss(fn):
        def inner(wx, wh, b, x, h0, c0):
            y, (hT, cT) = fn(wx, wh, b, x, args[4], h0, c0)
            return (jnp.sum(y * gy) + jnp.sum(hT * ghT)
                    + jnp.sum(cT * gcT))
        return inner

    diff_args = (args[0], args[1], args[2], args[3], args[5], args[6])
    g_ref = jax.grad(loss(lstm_scan), argnums=range(6))(*diff_args)
    g = jax.grad(
        loss(lambda *a: lstm_pallas(*a, True)),
        argnums=range(6))(*diff_args)
    names = ["wx", "wh", "b", "x", "h0", "c0"]
    for name, a, r in zip(names, g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_no_dones_matches_plain_lstm():
    T, B, F, H = 4, 2, 6, 10
    args = make_inputs(jax.random.key(5), T, B, F, H, with_dones=False)
    y_ref, _ = lstm_scan(*args)
    y, _ = lstm_pallas(*args, True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_r2d1_with_pallas_lstm_runs():
    """R2D1 end-to-end with the fused kernel (interpret mode on CPU):
    one training interval, finite loss, same program as the TPU path."""
    import numpy as np
    from rlpyt_tpu.agents.dqn import R2d1Agent
    from rlpyt_tpu.algos.r2d1 import R2D1
    from rlpyt_tpu.envs.classic import CartPole
    from rlpyt_tpu.models.dqn import R2d1MlpModel
    from rlpyt_tpu.runners.train import MinibatchRl
    from rlpyt_tpu.samplers.rollout import BatchSpec

    agent = R2d1Agent(ModelCls=R2d1MlpModel,
                      model_kwargs=dict(lstm_size=32,
                                        lstm_impl="pallas_interpret"),
                      eps_steps=100)
    algo = R2D1(batch_b=4, batch_T=8, warmup_T=4, min_steps_learn=0,
                replay_size=4096, replay_ratio=2.0, n_step_return=1,
                target_update_interval=5)
    runner = MinibatchRl(algo=algo, agent=agent, env=CartPole(),
                         batch_spec=BatchSpec(T=16, B=8),
                         n_steps=16 * 8 * 2, seed=0,
                         log_interval_steps=16 * 8,
                         max_decorrelation_steps=0)
    carry = runner.startup()
    carry, infos, _ = runner._run_interval(carry)
    assert np.isfinite(float(np.mean(np.asarray(infos.loss))))
