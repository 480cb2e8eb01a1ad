"""MAP + Laplace covariance utility (utils/laplace.py).

On a correlated Gaussian the MAP equals the mean and the Laplace
covariance equals the target covariance exactly (quadratic log-density),
so both are sharp asserts; the end-to-end check feeds the pair into Dram
as (theta_0, cov_est) — the reference workflow's hand-tuned inputs
(SURVEY.md §5.1) — and requires a healthy acceptance band.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import bipymc_tpu as bp
from bipymc_tpu.models.targets import correlated_gaussian


MEAN = np.array([1.5, -0.5], np.float32)
COV = np.array([[2.0, 0.9], [0.9, 1.0]], np.float32)


@pytest.fixture(scope="module")
def target():
    return correlated_gaussian(jnp.asarray(MEAN), jnp.asarray(COV))


def test_map_finds_mode(target):
    theta, info = bp.map_estimate(target, jnp.zeros(2), n_steps=1500,
                                  learning_rate=0.05)
    np.testing.assert_allclose(np.asarray(theta), MEAN, atol=5e-3)
    # logp path is ascending overall and finite
    path = np.asarray(info["logp_path"])
    assert np.isfinite(path).all()
    assert path[-1] >= path[0]


def test_laplace_cov_exact_on_gaussian(target):
    cov = bp.laplace_cov(target, jnp.asarray(MEAN))
    np.testing.assert_allclose(np.asarray(cov), COV, rtol=1e-4, atol=1e-5)


def test_laplace_cov_clamps_flat_directions():
    # flat in dim 1: -H has a zero eigenvalue; the clamp keeps it PSD
    lp = lambda x: -0.5 * x[0] ** 2
    cov = bp.laplace_cov(lp, jnp.zeros(2), min_scale=1e-6)
    w = np.linalg.eigvalsh(np.asarray(cov))
    assert (w > 0).all()
    assert np.isfinite(np.asarray(cov)).all()


def test_laplace_cov_floor_is_curvature_relative():
    # WIDE posterior (curvature 1e-4 << 1) with a flat dim: the flat
    # direction's variance must cap at min_scale^-1 times the sharp
    # direction's (docstring contract), not at the absolute 1/min_scale
    # the old max(w, 1.0)*min_scale floor produced
    lp = lambda x: -0.5 * 1e-4 * x[0] ** 2
    min_scale = 1e-6
    cov = np.asarray(bp.laplace_cov(lp, jnp.zeros(2), min_scale=min_scale))
    np.testing.assert_allclose(cov[0, 0], 1e4, rtol=1e-3)
    np.testing.assert_allclose(cov[1, 1], 1e4 / min_scale, rtol=1e-3)


def test_laplace_cov_no_curvature_unit_fallback():
    # not a mode anywhere (all eigenvalues of -H <= 0): degrade to unit
    # proposal variance, not 1/min_scale
    lp = lambda x: jnp.sum(0.0 * x)
    cov = np.asarray(bp.laplace_cov(lp, jnp.zeros(3)))
    np.testing.assert_allclose(cov, np.eye(3), atol=1e-6)


def test_map_laplace_drives_dram(target):
    theta0, cov, _ = bp.map_laplace(target, jnp.zeros(2), n_steps=1500)
    s = bp.Dram(target, seed=0, n_chains=4)
    s.run_mcmc(3000, theta0, cov_est=cov)
    acc = float(np.mean(np.asarray(s.acceptance_fraction)))
    # DRAM totals stage-1 + stage-2 acceptance: with an exact curvature-
    # matched proposal this lands ~0.7; anything in (0.1, 0.9) is sane
    assert 0.1 < acc < 0.9
    post = np.asarray(s.get_chain(discard=1000, flat=True))
    np.testing.assert_allclose(post.mean(0), MEAN, atol=0.3)
