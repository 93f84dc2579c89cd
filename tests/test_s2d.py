"""Space-to-depth first conv: exact-math equivalence with the plain
strided conv (models/conv.py:Conv2dModel.space_to_depth).

The stride-4 8x8 Nature-CNN first layer is algebraically identical to a
stride-1 2x2 conv over the 4x4-block space-to-depth input with the
kernel re-blocked the same way; this pins the weight correspondence so
the flag is provably a layout change, not a model change."""
import jax
import jax.numpy as jnp
import numpy as np

from rlpyt_tpu.models.conv import Conv2dModel
from rlpyt_tpu.models.dqn import AtariDqnModel

GEOM = dict(channels=(32, 64, 64), kernel_sizes=(8, 4, 3),
            strides=(4, 2, 1), paddings=(0, 1, 1))


def test_s2d_conv_matches_plain_conv():
    key = jax.random.key(0)
    x = jax.random.normal(key, (2, 4, 104, 80), jnp.float32)

    plain = Conv2dModel(**GEOM, space_to_depth=False)
    s2d = Conv2dModel(**GEOM, space_to_depth=True)
    p_plain = plain.init(key, x)

    # Re-block the first kernel as the 3D-conv weight
    # [C, k/s, k/s, s*s, O]: w3d[c,p,q,(dy,dx),o] = w[p*s+dy, q*s+dx, c, o]
    # — the s2d input is [B, C, H/s, W/s, s*s] with (dy, dx) blocks.
    k, s, C, O = 8, 4, 4, 32
    w = p_plain["params"]["Conv_0"]["kernel"]
    w2 = (w.reshape(k // s, s, k // s, s, C, O)
           .transpose(4, 0, 2, 1, 3, 5)
           .reshape(C, k // s, k // s, s * s, O))
    p_s2d = jax.tree.map(lambda a: a, p_plain)  # copy tree
    p_s2d["params"]["Conv_0"]["kernel"] = w2

    y_plain = plain.apply(p_plain, x)
    y_s2d = s2d.apply(p_s2d, x)
    assert y_plain.shape == y_s2d.shape
    np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y_plain),
                               rtol=1e-5, atol=1e-5)


def test_s2d_param_shape_and_fan_in():
    key = jax.random.key(1)
    x = jnp.zeros((2, 4, 104, 80), jnp.float32)
    p = Conv2dModel(**GEOM, space_to_depth=True).init(key, x)
    w = p["params"]["Conv_0"]["kernel"]
    assert w.shape == (4, 2, 2, 16, 32)
    # fan-in (init variance scale) matches the plain 8*8*4 kernel
    assert 4 * 2 * 2 * 16 == 8 * 8 * 4


def test_s2d_inert_when_geometry_disallows():
    """MinAtar-style stride-1 first conv: flag must not change params."""
    key = jax.random.key(2)
    x = jnp.zeros((2, 4, 10, 10), jnp.float32)
    geom = dict(channels=(16,), kernel_sizes=(3,), strides=(1,),
                paddings=(0,))
    p0 = Conv2dModel(**geom, space_to_depth=False).init(key, x)
    p1 = Conv2dModel(**geom, space_to_depth=True).init(key, x)
    assert (p0["params"]["Conv_0"]["kernel"].shape
            == p1["params"]["Conv_0"]["kernel"].shape)


def test_atari_dqn_model_s2d_default_runs():
    key = jax.random.key(3)
    obs = jnp.zeros((5, 4, 104, 80), jnp.uint8)
    model = AtariDqnModel(n_actions=6)
    params = model.init(key, obs)
    q = model.apply(params, obs)
    assert q.shape == (5, 6)
    assert params["params"]["Conv2dModel_0"]["Conv_0"]["kernel"].shape \
        == (4, 2, 2, 16, 32)


def test_blocked_frames_match_raw_obs_same_params():
    """One param set must serve both input paths: raw [B, K, H, W]
    uint8 (rollout) and batch-minor BlockedFrames (blocked replay
    sampling) — the round-5 batch-minor trunk's core contract."""
    from rlpyt_tpu.ops.pallas.frame_gather import BlockedFrames

    key = jax.random.key(11)
    n, Kf, Hh, Ww, Ss = 3, 4, 104, 80, 4
    obs = jax.random.randint(key, (n, Kf, Hh, Ww), 0, 256,
                             jnp.int32).astype(jnp.uint8)
    model = AtariDqnModel(n_actions=6)
    params = model.init(jax.random.key(12), obs)
    q_raw = model.apply(params, obs)

    x = obs.reshape(n, Kf, Hh // Ss, Ss, Ww // Ss, Ss)
    blocked = x.transpose(0, 1, 2, 4, 3, 5).reshape(
        n, Kf, Hh // Ss, Ww // Ss, Ss * Ss)
    bm = blocked.transpose(1, 2, 3, 4, 0)       # BlockedFrames contract
    q_blocked = model.apply(params, BlockedFrames(bm))
    np.testing.assert_allclose(np.asarray(q_blocked),
                               np.asarray(q_raw), rtol=2e-5, atol=2e-5)


def test_catdqn_blocked_frames_match_raw_obs_same_params():
    """Same contract for the C51 model (AtariCatDqnModel): the blocked
    replay path and the raw rollout path share one param set."""
    from rlpyt_tpu.models.dqn import AtariCatDqnModel
    from rlpyt_tpu.ops.pallas.frame_gather import BlockedFrames

    key = jax.random.key(21)
    n, Kf, Hh, Ww, Ss = 2, 4, 104, 80, 4
    obs = jax.random.randint(key, (n, Kf, Hh, Ww), 0, 256,
                             jnp.int32).astype(jnp.uint8)
    model = AtariCatDqnModel(n_actions=6, dueling=True)
    params = model.init(jax.random.key(22), obs)
    p_raw = model.apply(params, obs)

    x = obs.reshape(n, Kf, Hh // Ss, Ss, Ww // Ss, Ss)
    blocked = x.transpose(0, 1, 2, 4, 3, 5).reshape(
        n, Kf, Hh // Ss, Ww // Ss, Ss * Ss)
    bm = blocked.transpose(1, 2, 3, 4, 0)
    p_blocked = model.apply(params, BlockedFrames(bm))
    np.testing.assert_allclose(np.asarray(p_blocked),
                               np.asarray(p_raw), rtol=2e-5, atol=2e-5)
