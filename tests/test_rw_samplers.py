"""Single-chain family: posterior-moment recovery on analytic targets
(reference test strategy, SURVEY.md §6; BASELINE config 1)."""

import jax.numpy as jnp
import numpy as np
import pytest

from bipymc_tpu import (
    Metropolis, AdaptiveMetropolis, DrMetropolis, Dram)
from bipymc_tpu.models.targets import correlated_gaussian, banana
from bipymc_tpu.utils.diagnostics import gelman_rubin

MEAN = jnp.array([1.0, -1.0])
COV = jnp.array([[1.0, 0.8], [0.8, 1.5]])


@pytest.mark.parametrize("cls", [Metropolis, AdaptiveMetropolis,
                                 DrMetropolis, Dram])
def test_correlated_gaussian_moments(cls):
    log_prob = correlated_gaussian(MEAN, COV)
    s = cls(log_prob, seed=3, n_chains=4)
    s.run_mcmc(8000, jnp.zeros(2), cov_est=jnp.eye(2) * 0.5, spread=2.0)
    flat = s.get_chain(discard=2000, flat=True)
    np.testing.assert_allclose(flat.mean(axis=0), MEAN, atol=0.25)
    np.testing.assert_allclose(np.cov(flat.T), COV, atol=0.45)
    # acceptance in a sane band (DR's timid stage legitimately runs high)
    af = s.acceptance_fraction
    assert np.all(af > 0.05) and np.all(af < 0.95)


def test_dram_beats_mh_acceptance_on_bad_cov():
    """DR's timid second stage must rescue a too-bold proposal."""
    log_prob = correlated_gaussian(MEAN, COV)
    bad_cov = jnp.eye(2) * 25.0
    mh = Metropolis(log_prob, seed=0).run_mcmc(3000, MEAN, cov_est=bad_cov)
    dr = DrMetropolis(log_prob, seed=0).run_mcmc(3000, MEAN, cov_est=bad_cov)
    assert dr.acceptance_fraction[0] > mh.acceptance_fraction[0] * 1.5


def test_am_adapts_covariance():
    """After adaptation the proposal Cholesky should approximate
    s_d^{1/2} chol(posterior cov)."""
    log_prob = correlated_gaussian(MEAN, COV)
    s = AdaptiveMetropolis(log_prob, seed=1, t0=500, adapt_interval=25)
    s.run_mcmc(12000, MEAN, cov_est=jnp.eye(2) * 0.05)
    chol = np.asarray(s.final_state.chol[0])
    adapted_cov = chol @ chol.T / (2.38 ** 2 / 2)
    np.testing.assert_allclose(adapted_cov, COV, atol=0.6)


def test_banana_moments_dram():
    log_prob = banana(b=0.03, sigma1=10.0)
    s = Dram(log_prob, seed=5, n_chains=4, t0=300, adapt_interval=50)
    s.run_mcmc(12000, jnp.zeros(2), cov_est=jnp.diag(jnp.array([50.0, 10.0])),
               spread=3.0)
    flat = s.get_chain(discard=4000, flat=True)
    # E[θ1]=0, Var[θ1]=100, E[θ2]=0 for the Haario banana
    assert abs(flat[:, 0].mean()) < 2.0
    assert abs(flat[:, 1].mean()) < 2.0
    assert 55.0 < flat[:, 0].var() < 160.0


def test_rhat_near_one_on_stationary_chains():
    log_prob = correlated_gaussian(MEAN, COV)
    s = AdaptiveMetropolis(log_prob, seed=2, n_chains=6)
    s.run_mcmc(6000, MEAN, cov_est=COV, spread=1.0)
    rhat = gelman_rubin(jnp.asarray(s.super_chain)[:, 2000:, :])
    assert np.all(np.asarray(rhat) < 1.1)


def test_seeded_reproducibility():
    log_prob = correlated_gaussian(MEAN, COV)
    a = Metropolis(log_prob, seed=7).run_mcmc(500, MEAN).chain
    b = Metropolis(log_prob, seed=7).run_mcmc(500, MEAN).chain
    np.testing.assert_array_equal(a, b)
    c = Metropolis(log_prob, seed=8).run_mcmc(500, MEAN).chain
    assert not np.array_equal(a, c)


def test_am_every_step_rank1_mode():
    """adapt_interval=1 switches to the O(d²) rank-1 Cholesky update; the
    maintained factor must track chol(scatter + eps·I) and the sampler must
    still adapt to the target covariance."""
    import jax
    from bipymc_tpu.samplers import rw
    from bipymc_tpu.core.scan import run_scan

    log_prob = correlated_gaussian(MEAN, COV)
    cfg = rw.adaptive_metropolis_config(t0=300, adapt_interval=1, eps=1e-6)
    state = rw.init(MEAN, log_prob, jnp.eye(2) * 0.05)
    step = rw.make_step(log_prob, cfg)
    final, hist = jax.jit(lambda s, k: run_scan(
        step, s, k, 6000, collect_fn=lambda s_, i: s_.theta))(
        state, jax.random.key(0))

    # (a) factor integrity: m2 holds L_s with L_s L_sᵀ = scatter + eps·I
    theta_hist = np.asarray(hist)
    samples = np.concatenate([np.asarray(MEAN)[None, :], theta_hist], axis=0)
    mu = samples.mean(axis=0)
    scatter = (samples - mu).T @ (samples - mu)
    L_s = np.asarray(final.m2)
    np.testing.assert_allclose(L_s @ L_s.T,
                               scatter + 1e-6 * np.eye(2), rtol=1e-3)

    # (b) proposal factor approximates s_d^{1/2} chol(posterior cov)
    chol = np.asarray(final.chol)
    adapted_cov = chol @ chol.T / (2.38 ** 2 / 2)
    np.testing.assert_allclose(adapted_cov, np.asarray(COV), atol=0.6)

    # (c) posterior recovery
    kept = theta_hist[2000:]
    np.testing.assert_allclose(kept.mean(axis=0), MEAN, atol=0.3)
