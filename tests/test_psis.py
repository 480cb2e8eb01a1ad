"""PSIS surrogate→exact reweighting — utils/psis.py.

Anchors: the Zhang-Stephens GPD fit recovers known (k, σ); k̂ certifies
good proposals and flags variance-exploding ones; the one-call
surrogate_reweight corrects a biased surrogate posterior.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bipymc_tpu.utils.psis import (gpd_fit, psis, importance_ess,
                                   importance_resample, weighted_moments,
                                   surrogate_reweight)


def _gpd_draws(rng, k, sigma, n):
    u = rng.uniform(size=n)
    return sigma * (u ** (-k) - 1.0) / k


def test_gpd_fit_recovers_shape_and_scale():
    rng = np.random.default_rng(0)
    for k_true in (0.2, 0.5):
        y = _gpd_draws(rng, k_true, 1.0, 4000).astype(np.float32)
        k, sigma = gpd_fit(jnp.asarray(y))
        assert abs(float(k) - k_true) < 0.1, (k_true, float(k))
        assert 0.8 < float(sigma) < 1.25, float(sigma)


def test_psis_good_proposal_is_reliable():
    # proposal N(0, 1.3²) for target N(0,1): light-tailed weights, k̂ < 0
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1.3, 4000).astype(np.float32)
    logw = (-0.5 * x ** 2) - (-0.5 * (x / 1.3) ** 2 - np.log(1.3))
    lw_s, khat = psis(jnp.asarray(logw))
    assert float(khat) < 0.5, float(khat)
    ess = float(importance_ess(lw_s))
    assert ess > 1000, ess
    mean, var = weighted_moments(jnp.asarray(x)[:, None], lw_s)
    assert abs(float(mean[0])) < 0.08
    assert abs(float(var[0]) - 1.0) < 0.15


def test_psis_flags_heavy_tailed_weights():
    # w = u^{-1}: exact Pareto with infinite mean (k = 1) → flagged
    rng = np.random.default_rng(2)
    u = rng.uniform(size=4000)
    logw = (-np.log(u)).astype(np.float32)
    _, khat = psis(jnp.asarray(logw))
    assert float(khat) > 0.7, float(khat)
    # ordering: a narrow normal proposal (heavier weights) scores a
    # clearly larger k̂ than a wide one, even where the slowly-varying
    # log-correction keeps the finite-sample k̂ under its asymptote
    def _khat_normal(sig, seed):
        r = np.random.default_rng(seed)
        x = r.normal(0, sig, 4000).astype(np.float32)
        lw = (-0.5 * x ** 2) - (-0.5 * (x / sig) ** 2 - np.log(sig))
        return float(psis(jnp.asarray(lw))[1])
    assert _khat_normal(0.4, 2) > _khat_normal(1.3, 2) + 0.3


def test_psis_shift_invariant_and_capped():
    rng = np.random.default_rng(3)
    logw = rng.normal(size=500).astype(np.float32)
    a, ka = psis(jnp.asarray(logw))
    b, kb = psis(jnp.asarray(logw + 7.0))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    assert abs(float(ka) - float(kb)) < 1e-6
    assert float(jnp.max(a)) <= 1e-6          # capped at raw max (=0)


def test_psis_reduces_weight_variance():
    rng = np.random.default_rng(4)
    x = rng.normal(0, 0.8, 2000).astype(np.float32)
    logw = (-0.5 * x ** 2) - (-0.5 * (x / 0.8) ** 2 - np.log(0.8))
    raw_ess = float(importance_ess(jnp.asarray(logw)))
    lw_s, _ = psis(jnp.asarray(logw))
    smooth_ess = float(importance_ess(lw_s))
    assert smooth_ess >= raw_ess * 0.99, (raw_ess, smooth_ess)


def test_surrogate_reweight_corrects_bias():
    # "surrogate" posterior N(0.25, 1.2²) vs exact N(0, 1) in 2d
    rng = np.random.default_rng(5)
    samples = rng.normal(0.25, 1.2, (4000, 2)).astype(np.float32)
    exact = lambda th: -0.5 * jnp.sum(th ** 2)
    surr = lambda th: -0.5 * jnp.sum(((th - 0.25) / 1.2) ** 2)
    out = surrogate_reweight(jnp.asarray(samples), exact, surr)
    assert bool(out["reliable"])
    raw_bias = abs(samples.mean(0)).max()
    corrected_bias = float(jnp.max(jnp.abs(out["mean"])))
    assert corrected_bias < 0.08, (raw_bias, corrected_bias)
    assert raw_bias > 0.2
    np.testing.assert_allclose(np.asarray(out["var"]), 1.0, atol=0.15)
    assert float(out["ess"]) > 500


def test_importance_resample_matches_weighted_mean():
    rng = np.random.default_rng(6)
    samples = rng.normal(0, 1, (3000, 1)).astype(np.float32)
    logw = jnp.asarray(samples[:, 0])          # tilt towards positive
    lw_s, _ = psis(logw)
    res = importance_resample(jax.random.key(0), jnp.asarray(samples),
                              lw_s, n=6000)
    wm, _ = weighted_moments(jnp.asarray(samples), lw_s)
    assert abs(float(res.mean()) - float(wm[0])) < 0.08


def test_psis_validates_input():
    with pytest.raises(ValueError):
        psis(jnp.zeros(3))


def test_psis_jits():
    logw = jnp.asarray(np.random.default_rng(7).normal(
        size=512).astype(np.float32))
    f = jax.jit(psis)
    a, k = f(logw)
    b, k2 = psis(logw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert abs(float(k) - float(k2)) < 1e-6


def test_gpd_sigma_positive_near_zero_k():
    # Regression: light tails whose raw k̂ is slightly NEGATIVE while the
    # prior-regularised k̂ is slightly positive. σ must come from the raw
    # k (σ = −k_raw/b > 0 always); deriving it from the regularised k
    # flipped its sign and produced NaN elpd on real MCMC draws.
    rng = np.random.default_rng(8)
    for trial in range(20):
        y = rng.exponential(0.05, 150).astype(np.float32)  # k_true = 0
        k, sigma = gpd_fit(jnp.asarray(np.sort(y)))
        assert float(sigma) > 0.0, (trial, float(k), float(sigma))
        assert np.isfinite(float(k))


def test_psis_no_nan_on_exponential_tail():
    # The end-to-end shape of the same regression: weights whose tail is
    # near-exponential (k̂ ≈ 0) must smooth to finite values.
    rng = np.random.default_rng(9)
    for seed in range(10):
        logw = jnp.asarray(np.random.default_rng(seed).normal(
            0, 0.4, 2500).astype(np.float32))
        lw, khat = psis(logw)
        assert bool(jnp.isfinite(lw).all()), seed
        assert np.isfinite(float(khat)), seed


def test_psis_degenerate_constant_weights():
    # All-equal weights (log-lik constant in θ): nothing to smooth,
    # gpd_fit would divide by zero — guarded with k̂ = −inf, untouched w.
    lw, khat = psis(jnp.zeros(64))
    assert float(khat) == -np.inf
    np.testing.assert_array_equal(np.asarray(lw), 0.0)
