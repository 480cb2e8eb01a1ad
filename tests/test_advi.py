"""ADVI (samplers/advi.py): exactness on Gaussian targets (mean-field on
a diagonal target, full-rank on a correlated one), ELBO convergence to
the analytic optimum, restart machinery, continuation contract, the
non-finite sanitizers, and the init_pair → MCMC composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bipymc_tpu as bp
from bipymc_tpu.models.targets import correlated_gaussian
from bipymc_tpu.samplers import advi

MEAN = jnp.array([1.0, -2.0, 0.5])
VAR = jnp.array([0.5, 2.0, 1.0])


def _diag_gaussian(mean, var):
    def lp(x):
        return -0.5 * jnp.sum((x - mean) ** 2 / var)
    return lp


def test_mean_field_recovers_diagonal_gaussian():
    lp = _diag_gaussian(MEAN, VAR)
    a = bp.Advi(lp, n_restarts=2, seed=0, step_size=0.05, n_mc=8)
    info = a.run(3000, theta_0=jnp.zeros(3), spread=1.0)
    np.testing.assert_allclose(a.mean, np.asarray(MEAN), atol=0.1)
    np.testing.assert_allclose(np.diag(a.cov), np.asarray(VAR),
                               rtol=0.2)
    # ELBO at the optimum = log normalising constant of the
    # unnormalised target: (d/2)log 2π + ½Σlog var
    analytic = 0.5 * 3 * np.log(2 * np.pi) + 0.5 * float(
        jnp.sum(jnp.log(VAR)))
    assert abs(info["elbo"] - analytic) < 0.1


def test_full_rank_recovers_correlations():
    cov = jnp.array([[1.0, 0.8], [0.8, 1.5]])
    lp = correlated_gaussian(jnp.zeros(2), cov)
    a = bp.Advi(lp, n_restarts=2, seed=1, full_rank=True,
                step_size=0.05, n_mc=8)
    a.run(3000, theta_0=jnp.zeros(2))
    np.testing.assert_allclose(a.cov, np.asarray(cov), rtol=0.25,
                               atol=0.1)
    assert a.cov[0, 1] > 0.5  # the off-diagonal is really there
    # mean-field on the same target CANNOT put mass on the off-diagonal
    b = bp.Advi(lp, n_restarts=1, seed=1, step_size=0.05)
    b.run(1500, theta_0=jnp.zeros(2))
    assert b.cov[0, 1] == 0.0


def test_elbo_increases_and_continuation():
    lp = _diag_gaussian(MEAN, VAR)
    a = bp.Advi(lp, n_restarts=2, seed=3, step_size=0.05)
    i1 = a.run(400, theta_0=jnp.full(3, 5.0))
    i2 = a.run(400)  # continuation improves (or holds) the fit
    assert i2["elbo"] > i1["elbo"] - 0.2
    assert i2["elbo_history"].shape == (2, 800)
    with pytest.warns(UserWarning, match="theta_0 ignored"):
        a.run(10, theta_0=jnp.zeros(3))


def test_restart_elbo_spread_flags_multimodality():
    # two well-separated modes with different widths: restarts fall into
    # different basins and their ELBOs differ by the basin's local
    # evidence — the documented multimodality diagnostic
    def lp(x):
        a = -0.5 * jnp.sum((x - 4.0) ** 2 / 0.25)   # narrow
        b = -0.5 * jnp.sum((x + 4.0) ** 2)           # wide
        return jnp.logaddexp(a, b)

    starts = jnp.array([[4.0, 4.0], [-4.0, -4.0]])
    a = bp.Advi(lp, n_restarts=2, seed=0, step_size=0.05)
    info = a.run(2000, theta_0=starts)
    spread = info["elbo_by_restart"].max() - info["elbo_by_restart"].min()
    assert spread > 0.5
    # the wide basin carries more local evidence (same height, 4x the
    # volume per dim): the best restart is the one that started there
    assert a.mean[0] < 0


def test_nonfinite_target_and_step_rejection():
    # q overlapping an out-of-support region must not poison the fit
    def lp(x):
        inside = jnp.all(x > 0.0)
        return jnp.where(inside, -0.5 * jnp.sum((x - 2.0) ** 2), -jnp.inf)

    a = bp.Advi(lp, n_restarts=1, seed=0, step_size=0.05)
    a.run(2000, theta_0=jnp.full(2, 1.0))
    assert np.all(np.isfinite(a.mean)) and np.all(np.isfinite(a.cov))
    np.testing.assert_allclose(a.mean, 2.0, atol=0.25)


def test_sample_and_init_pair_compose_with_dram():
    cov = jnp.array([[1.0, 0.6], [0.6, 1.5]])
    mean = jnp.array([2.0, -1.0])
    lp = correlated_gaussian(mean, cov)
    a = bp.Advi(lp, n_restarts=2, seed=5, full_rank=True,
                step_size=0.05)
    a.run(2500, theta_0=jnp.zeros(2))
    draws = a.sample(4000)
    np.testing.assert_allclose(draws.mean(0), np.asarray(mean), atol=0.1)
    np.testing.assert_allclose(np.cov(draws.T), np.asarray(cov),
                               rtol=0.3, atol=0.15)

    theta0, cov_est = a.init_pair()
    s = bp.Dram(lp, seed=0, n_chains=4)
    s.run_mcmc(3000, theta0, cov_est=cov_est)
    flat = np.asarray(s.get_chain(discard=1000, flat=True))
    assert np.abs(flat.mean(0) - np.asarray(mean)).max() < 0.2


def test_validation():
    lp = _diag_gaussian(MEAN, VAR)
    with pytest.raises(ValueError, match="first run"):
        bp.Advi(lp).run(5)
    with pytest.raises(ValueError, match="n_steps"):
        bp.Advi(lp).run(0, theta_0=jnp.zeros(3))
    with pytest.raises(ValueError, match="n_restarts"):
        bp.Advi(lp, n_restarts=0)
    with pytest.raises(RuntimeError, match="run"):
        bp.Advi(lp).mean
