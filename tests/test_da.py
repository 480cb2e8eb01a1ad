"""Delayed-acceptance Metropolis — samplers/da.py + api.DelayedAcceptance.

Anchors: (a) the chain targets the EXACT posterior even under a biased
surrogate; (b) a perfect surrogate makes stage 2 accept every promotion;
(c) accepted ⊆ promoted; (d) the masked external path evaluates only
promoted rows and is bit-identical to the on-device exact path.
"""

import numpy as np
import jax
import jax.numpy as jnp

import bipymc_tpu as bp
from bipymc_tpu.models.targets import correlated_gaussian

MEAN = jnp.array([1.0, -1.0])
COV = jnp.array([[1.0, 0.6], [0.6, 1.2]])


def _exact():
    return correlated_gaussian(MEAN, COV)


def _biased_surrogate():
    # wrong mean AND wrong scale — DA must still target the exact posterior
    return correlated_gaussian(MEAN + 0.4, COV * 2.0)


def test_da_targets_exact_posterior_despite_biased_surrogate():
    s = bp.DelayedAcceptance(_exact(), _biased_surrogate(), seed=0,
                             n_chains=8)
    s.run_mcmc(6000, jnp.zeros(2), cov_est=jnp.eye(2))
    flat = s.get_chain(discard=2000, flat=True)
    np.testing.assert_allclose(flat.mean(0), np.asarray(MEAN), atol=0.15)
    np.testing.assert_allclose(np.cov(flat.T), np.asarray(COV), atol=0.35)


def test_da_perfect_surrogate_accepts_every_promotion():
    lp = _exact()
    s = bp.DelayedAcceptance(lp, lp, seed=1, n_chains=4, adapt=False)
    s.run_mcmc(800, jnp.zeros(2), cov_est=jnp.eye(2) * 0.5)
    h = s._history
    np.testing.assert_array_equal(h["accepted"], h["promoted"])


def test_da_accepted_subset_of_promoted_and_rates():
    s = bp.DelayedAcceptance(_exact(), _biased_surrogate(), seed=2,
                             n_chains=8)
    s.run_mcmc(2000, jnp.zeros(2), cov_est=jnp.eye(2))
    h = s._history
    assert not np.any(h["accepted"] & ~h["promoted"])
    promo = s.promotion_fraction
    acc = s.acceptance_fraction
    assert np.all(promo < 1.0) and np.all(promo > 0.02)
    assert np.all(acc <= promo)


def test_da_masked_external_matches_device_and_skips_rows():
    lp_np_calls = {"rows": 0}

    def host_exact(theta):
        lp_np_calls["rows"] += 1
        diff = theta - np.asarray(MEAN)
        prec = np.linalg.inv(np.asarray(COV))
        return float(-0.5 * diff @ prec @ diff)

    n_chains, n_steps = 8, 400
    masked_ll = bp.external_log_like_masked(host_exact)
    s_ext = bp.DelayedAcceptance(masked_ll, _biased_surrogate(), seed=3,
                                 n_chains=n_chains, masked_exact=True,
                                 adapt=False)
    s_ext.run_mcmc(n_steps, jnp.zeros(2), cov_est=jnp.eye(2))

    s_dev = bp.DelayedAcceptance(_exact(), _biased_surrogate(), seed=3,
                                 n_chains=n_chains, adapt=False)
    s_dev.run_mcmc(n_steps, jnp.zeros(2), cov_est=jnp.eye(2))

    # identical bit stream → identical trajectories (masked rows are
    # never read by the accept rule)
    np.testing.assert_allclose(s_ext.super_chain, s_dev.super_chain,
                               rtol=1e-6, atol=1e-6)
    # the host only saw promoted rows (plus n_chains init evals)
    promoted = int(s_dev._history["promoted"].sum())
    assert lp_np_calls["rows"] == promoted + n_chains, (
        lp_np_calls["rows"], promoted)
    assert promoted < n_steps * n_chains * 0.8


def test_da_with_adaptation_and_rhat_stop():
    s = bp.DelayedAcceptance(_exact(), _biased_surrogate(), seed=4,
                             n_chains=8, adapt=True, t0=200)
    info = s.run_mcmc_until(jnp.zeros(2), rhat_tol=1.1, chunk=200,
                            max_chunks=40, spread=1.0)
    assert info["rhat"].max() < 1.1
    assert int(info["steps"]) >= 400


def test_da_gp_surrogate_composition():
    """The intended workflow: GP surrogate promotes, exact corrects."""
    from bipymc_tpu.gp.regressor import GpRegressor
    rng = np.random.default_rng(0)
    lp = _exact()
    x_design = rng.uniform(-2, 3, (128, 2)).astype(np.float32)
    y_design = np.asarray(jax.vmap(lp)(jnp.asarray(x_design)))
    gp = GpRegressor(normalize_y=True)
    params, _ = gp.optimize(jnp.asarray(x_design), jnp.asarray(y_design),
                            steps=150)
    fit = gp.fit(jnp.asarray(x_design), jnp.asarray(y_design), params)
    surr = gp.surrogate_log_like(fit)
    s = bp.DelayedAcceptance(lp, surr, seed=5, n_chains=8)
    s.run_mcmc(4000, jnp.zeros(2), cov_est=jnp.eye(2))
    flat = s.get_chain(discard=1500, flat=True)
    np.testing.assert_allclose(flat.mean(0), np.asarray(MEAN), atol=0.2)
    # a good surrogate keeps the stage-2 correction cheap: most
    # promotions survive
    h = s._history
    survive = h["accepted"].sum() / max(h["promoted"].sum(), 1)
    assert survive > 0.7, survive
