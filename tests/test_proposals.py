"""Proposal distribution tests (reference: proposal classes' sampling
moments and ln-pdf values, SURVEY.md §6)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats

from bipymc_tpu.samplers.proposals import (
    gaussian_sample, gaussian_logpdf, cov_to_chol)


def test_gaussian_sample_moments():
    key = jax.random.key(0)
    mean = jnp.array([1.0, -2.0])
    cov = jnp.array([[2.0, 0.6], [0.6, 1.0]])
    chol = cov_to_chol(cov)
    keys = jax.random.split(key, 20000)
    xs = jax.vmap(lambda k: gaussian_sample(k, mean, chol))(keys)
    np.testing.assert_allclose(np.mean(xs, axis=0), mean, atol=0.05)
    np.testing.assert_allclose(np.cov(np.asarray(xs).T), cov, atol=0.08)


def test_gaussian_logpdf_matches_scipy():
    mean = np.array([0.5, -1.0, 2.0])
    cov = np.array([[1.5, 0.2, 0.0], [0.2, 0.8, -0.1], [0.0, -0.1, 2.0]])
    chol = cov_to_chol(jnp.asarray(cov, jnp.float64)
                       if jax.config.jax_enable_x64 else jnp.asarray(cov))
    x = np.array([0.1, 0.2, 0.3])
    got = gaussian_logpdf(jnp.asarray(x, chol.dtype),
                          jnp.asarray(mean, chol.dtype), chol)
    want = scipy.stats.multivariate_normal(mean, cov).logpdf(x)
    np.testing.assert_allclose(got, want, rtol=1e-5)
