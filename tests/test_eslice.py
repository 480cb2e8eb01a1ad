"""Elliptical slice sampling (samplers/eslice.py) — beyond-reference.

Anchor: Gaussian likelihood × Gaussian prior is conjugate, so the
stationary distribution is a closed-form Gaussian — moments must match.
The log_like convention (likelihood factor ONLY; the prior enters
through the ellipse) is what every correctness check here exercises.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import bipymc_tpu as bp
from bipymc_tpu.samplers import eslice
from bipymc_tpu.parallel.mesh import chain_mesh


def _gauss_like(y, sigma2):
    yj = jnp.asarray(y)

    def ll(x):
        return -0.5 * jnp.sum((x - yj) ** 2) / sigma2

    return ll


def _conjugate_posterior(y, sigma2, tau2):
    """prior N(0, τ²I) × likelihood N(x; y, σ²I) → posterior moments."""
    prec = 1.0 / tau2 + 1.0 / sigma2
    return np.asarray(y) / (sigma2 * prec), 1.0 / prec


def test_conjugate_gaussian_moments():
    y = np.array([1.0, -2.0, 0.5])
    sigma2, tau2 = 0.5, 4.0
    post_mean, post_var = _conjugate_posterior(y, sigma2, tau2)
    s = bp.EllipticalSlice(_gauss_like(y, sigma2), prior_mean=0.0,
                           prior_chol=np.sqrt(tau2), n_chains=16, seed=0)
    s.run_mcmc(3000, jnp.zeros(3), spread=1.0)
    flat = s.get_chain(discard=500, flat=True)
    assert np.abs(flat.mean(0) - post_mean).max() < 0.05
    assert np.abs(flat.var(0) - post_var).max() < 0.05


def test_prior_only_is_exact_prior_sampling():
    """log L ≡ 0: the very first angle always passes the slice test
    (0 > log u), so n_shrink == 1 everywhere and the draws are exact,
    INDEPENDENT prior samples — including a full-rank prior."""
    cov = np.array([[2.0, 0.9, 0.0],
                    [0.9, 1.0, -0.3],
                    [0.0, -0.3, 0.5]])
    chol = np.linalg.cholesky(cov)
    mu = np.array([1.0, 0.0, -1.0])
    s = bp.EllipticalSlice(lambda x: jnp.zeros(()), prior_mean=mu,
                           prior_chol=chol, n_chains=8, seed=1)
    s.run_mcmc(2000, jnp.asarray(mu), spread=0.5)
    assert np.all(np.asarray(s._history["n_shrink"]) == 1)
    assert np.all(np.asarray(s._history["accepted"]))
    flat = s.get_chain(discard=100, flat=True)
    assert np.abs(flat.mean(0) - mu).max() < 0.1
    assert np.abs(np.cov(flat.T) - cov).max() < 0.15


def test_ill_conditioned_prior_no_tuning():
    """Condition-1e6 prior: RW/HMC step sizes collapse to the smallest
    scale; the ellipse samples the prior exactly at any conditioning.
    With a weak likelihood the posterior ≈ prior — both extreme scales
    must be recovered with NO tuning knobs touched."""
    scales = np.array([1e3, 1.0, 1e-3])
    y = np.zeros(3)
    sigma2 = 1e8                                     # weak likelihood
    s = bp.EllipticalSlice(_gauss_like(y, sigma2), prior_mean=0.0,
                           prior_chol=scales, n_chains=8, seed=2)
    s.run_mcmc(4000, jnp.zeros(3), spread=0.0)
    flat = s.get_chain(discard=500, flat=True)
    ratio = flat.std(0) / scales
    assert np.all(ratio > 0.8) and np.all(ratio < 1.2), ratio


def test_escape_from_out_of_support_start():
    """loglike = -inf start: log y = -inf, so the first in-support point
    on the ellipse escape-accepts (repo sanitizer policy, as in HMC)."""
    def ll(x):
        return jnp.where(jnp.all(jnp.abs(x) < 2.0), 0.0, -jnp.inf)

    s = bp.EllipticalSlice(ll, prior_mean=0.0, prior_chol=1.0,
                           n_chains=4, seed=3)
    s.run_mcmc(20, 10.0 * jnp.ones(2), spread=0.0)   # far outside
    ll_hist = np.asarray(s._history["loglike"])
    assert np.isfinite(ll_hist[-1]).all()


def test_nan_likelihood_is_rejected_not_propagated():
    def ll(x):
        good = -0.5 * jnp.sum(x * x)
        return jnp.where(x[0] > 0.5, jnp.nan, good)

    s = bp.EllipticalSlice(ll, prior_mean=0.0, prior_chol=1.0,
                           n_chains=8, seed=4)
    s.run_mcmc(300, jnp.full(2, -1.0), spread=0.2)
    x = np.asarray(s._history["x"])
    assert np.isfinite(x).all()
    assert np.all(x[..., 0] <= 0.5)      # NaN region never entered


def test_max_shrink_cap_falls_back_to_current_state():
    """max_shrink=1 with a sharp likelihood: some generations exhaust
    the cap; they must return the CURRENT state (θ→0 limit), flagged
    accepted=False, with the trajectory still finite."""
    y = np.zeros(4)
    s = bp.EllipticalSlice(_gauss_like(y, 1e-4), prior_mean=0.0,
                           prior_chol=1.0, n_chains=8, seed=5,
                           max_shrink=1)
    s.run_mcmc(200, jnp.zeros(4), spread=0.01)
    acc = np.asarray(s._history["accepted"])
    x = np.asarray(s._history["x"])
    assert np.isfinite(x).all()
    assert not acc.all()                 # the cap actually fired
    # wherever it fired, the position did not move
    t, c = np.nonzero(~acc)
    keep = t > 0                         # t=0 has no previous kept row
    moved = np.abs(x[t[keep], c[keep]] - x[t[keep] - 1, c[keep]])
    assert np.all(moved.max(axis=-1) == 0.0)


def test_chain_count_invariance():
    """Keys fold on the GLOBAL chain index: chain i's trajectory is
    independent of how many chains run beside it (repo contract)."""
    y = np.array([0.5, -0.5])
    ll = _gauss_like(y, 1.0)
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(8, 2))
                     .astype(np.float32))
    a = bp.EllipticalSlice(ll, 0.0, 1.0, n_chains=8, seed=6)
    a.run_mcmc(50, x0)
    b = bp.EllipticalSlice(ll, 0.0, 1.0, n_chains=4, seed=6)
    b.run_mcmc(50, x0[:4])
    np.testing.assert_array_equal(a.super_chain[:4], b.super_chain)


def test_mesh_equals_vmap():
    """Chains fully independent → no in-step collectives; identical
    streams, bit-identical at 2 chains/device (same contract as HMC)."""
    ll = _gauss_like(np.array([1.0, -1.0]), 0.7)
    a = bp.EllipticalSlice(ll, 0.0, 1.5, n_chains=16, seed=7)
    a.run_mcmc(100, jnp.zeros(2), spread=1.0)
    b = bp.EllipticalSlice(ll, 0.0, 1.5, n_chains=16, seed=7,
                           mesh=chain_mesh())
    b.run_mcmc(100, jnp.zeros(2), spread=1.0)
    np.testing.assert_array_equal(a.super_chain, b.super_chain)


def test_diag_vector_matches_diag_matrix():
    """A [d] diagonal prior_chol and the equivalent [d,d] matrix must
    produce bit-identical trajectories (same ν = Lz elementwise)."""
    ll = _gauss_like(np.zeros(3), 2.0)
    diag = np.array([2.0, 0.5, 1.0], np.float32)
    a = bp.EllipticalSlice(ll, 0.0, diag, n_chains=4, seed=8)
    a.run_mcmc(60, jnp.zeros(3), spread=0.5)
    b = bp.EllipticalSlice(ll, 0.0, np.diag(diag), n_chains=4, seed=8)
    b.run_mcmc(60, jnp.zeros(3), spread=0.5)
    np.testing.assert_array_equal(a.super_chain, b.super_chain)


def test_run_until_rhat_stop():
    y = np.array([1.0, -1.0])
    s = bp.EllipticalSlice(_gauss_like(y, 0.5), 0.0, 2.0,
                           n_chains=16, seed=9)
    info = s.run_mcmc_until(jnp.zeros(2), rhat_tol=1.05, chunk=100,
                            max_chunks=50, spread=2.0)
    assert np.max(info["rhat"]) < 1.05
    assert info["steps"] > 0


def test_continuation_contract():
    ll = _gauss_like(np.zeros(2), 1.0)
    s = bp.EllipticalSlice(ll, 0.0, 1.0, n_chains=4, seed=10)
    s.run_mcmc(50, jnp.zeros(2))
    with pytest.warns(UserWarning):
        s.run_mcmc(50, jnp.ones(2))      # ignored theta_0 must warn
    assert s.super_chain.shape[1] == 100


def test_logp_is_full_posterior():
    """info.logp = loglike + exact N(μ,Σ) logpdf at the new state."""
    y = np.array([0.3, -0.7])
    sigma2 = 0.8
    cov = np.array([[1.5, 0.4], [0.4, 0.9]])
    chol = np.linalg.cholesky(cov)
    mu = np.array([0.2, -0.1])
    s = bp.EllipticalSlice(_gauss_like(y, sigma2), mu, chol,
                           n_chains=4, seed=11)
    s.run_mcmc(30, jnp.asarray(mu), spread=0.3)
    x = np.asarray(s._history["x"])                  # [T, n, d]
    lp = np.asarray(s._history["logp"])
    llh = np.asarray(s._history["loglike"])
    r = x - mu
    inv = np.linalg.inv(cov)
    quad = np.einsum("tnd,de,tne->tn", r, inv, r)
    prior = (-0.5 * quad - 0.5 * np.log(np.linalg.det(cov))
             - np.log(2 * np.pi))
    np.testing.assert_allclose(lp, llh + prior, rtol=2e-4, atol=2e-4)
