"""Distribution math tests (closed forms + sampling sanity)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlpyt_tpu.distributions.categorical import Categorical, DistInfo
from rlpyt_tpu.distributions.epsilon_greedy import (
    CategoricalEpsilonGreedy,
    EpsilonGreedy,
)
from rlpyt_tpu.distributions.gaussian import DistInfoStd, Gaussian


def test_categorical_log_likelihood():
    dist = Categorical(3)
    info = DistInfo(prob=jnp.array([[0.2, 0.3, 0.5]]))
    ll = dist.log_likelihood(jnp.array([2]), info)
    assert float(ll[0]) == pytest.approx(math.log(0.5), abs=1e-5)


def test_categorical_entropy_kl():
    dist = Categorical(4)
    uniform = DistInfo(prob=jnp.full((1, 4), 0.25))
    assert float(dist.entropy(uniform)[0]) == pytest.approx(math.log(4),
                                                            abs=1e-5)
    assert float(dist.kl(uniform, uniform)[0]) == pytest.approx(0, abs=1e-6)
    peaked = DistInfo(prob=jnp.array([[0.97, 0.01, 0.01, 0.01]]))
    assert float(dist.kl(peaked, uniform)[0]) > 0


def test_categorical_sampling_frequencies():
    dist = Categorical(3)
    p = jnp.array([0.6, 0.3, 0.1])
    info = DistInfo(prob=jnp.broadcast_to(p, (20000, 3)))
    acts = dist.sample(jax.random.key(0), info)
    freqs = np.bincount(np.asarray(acts), minlength=3) / 20000
    np.testing.assert_allclose(freqs, np.asarray(p), atol=0.02)


def test_gaussian_log_likelihood_closed_form():
    dist = Gaussian(dim=2)
    mean = jnp.zeros((1, 2))
    log_std = jnp.zeros((1, 2))
    ll = dist.log_likelihood(jnp.zeros((1, 2)),
                             DistInfoStd(mean, log_std))
    assert float(ll[0]) == pytest.approx(-math.log(2 * math.pi), abs=1e-5)


def test_gaussian_squash_log_prob_consistency():
    """sample_with_log_prob and log_likelihood agree on squashed samples."""
    dist = Gaussian(dim=3, squash=1.0)
    key = jax.random.key(0)
    info = DistInfoStd(mean=jnp.array([[0.3, -0.2, 0.1]]),
                       log_std=jnp.array([[-1.0, -0.5, -1.5]]))
    action, logp = dist.sample_with_log_prob(key, info)
    assert jnp.all(jnp.abs(action) <= 1.0)
    logp2 = dist.log_likelihood(action, info)
    np.testing.assert_allclose(np.asarray(logp), np.asarray(logp2),
                               rtol=1e-3, atol=1e-3)


def test_gaussian_entropy_monotone_in_std():
    dist = Gaussian(dim=1)
    lo = dist.entropy(DistInfoStd(jnp.zeros((1, 1)),
                                  jnp.full((1, 1), -1.0)))
    hi = dist.entropy(DistInfoStd(jnp.zeros((1, 1)),
                                  jnp.full((1, 1), 1.0)))
    assert float(hi[0]) > float(lo[0])


def test_epsilon_greedy():
    dist = EpsilonGreedy(4)
    q = jnp.tile(jnp.array([[0.0, 1.0, 0.0, 0.0]]), (5000, 1))
    greedy = dist.sample(jax.random.key(0), q, jnp.float32(0.0))
    assert np.all(np.asarray(greedy) == 1)
    eps_acts = dist.sample(jax.random.key(1), q, jnp.float32(1.0))
    freqs = np.bincount(np.asarray(eps_acts), minlength=4) / 5000
    np.testing.assert_allclose(freqs, 0.25 * np.ones(4), atol=0.03)


def test_epsilon_greedy_vector_eps():
    """Per-env ε: env 0 fully greedy, env 1 fully random."""
    dist = EpsilonGreedy(2)
    q = jnp.tile(jnp.array([[0.0, 1.0]]), (2, 1))
    eps = jnp.array([0.0, 1.0])
    acts = [np.asarray(dist.sample(jax.random.key(i), q, eps))
            for i in range(200)]
    acts = np.stack(acts)
    assert np.all(acts[:, 0] == 1)
    assert 0.3 < np.mean(acts[:, 1] == 1) < 0.7


def test_categorical_epsilon_greedy():
    z = jnp.array([-1.0, 0.0, 1.0])
    dist = CategoricalEpsilonGreedy(2, z)
    # action 0 has mass on high atoms, action 1 on low
    p = jnp.array([[[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]]])
    act = dist.sample(jax.random.key(0), p, jnp.float32(0.0))
    assert int(act[0]) == 0
