"""Constrained-parameter transforms (utils/transforms.py): round-trips
and autodiff-checked Jacobians in every bound regime, batch
broadcasting, and end-to-end posterior recovery through bounded supports
with a gradient sampler (the case -inf-outside-the-box cannot serve) and
with ADVI (exact on a lognormal target, which is Gaussian in u-space)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bipymc_tpu as bp
from bipymc_tpu.utils.transforms import constrain, transform_log_prob

# one transform exercising all four regimes at once
T_ALL = constrain(lower=[-np.inf, 0.0, -np.inf, -1.0],
                  upper=[np.inf, np.inf, 2.0, 3.0])


def test_roundtrip_all_regimes():
    u = jnp.array([[0.3, -1.2, 0.7, 2.1],
                   [-5.0, 4.0, -3.0, -6.0]])
    th = T_ALL.forward(u)
    # support respected
    assert np.all(np.asarray(th[:, 1]) > 0.0)
    assert np.all(np.asarray(th[:, 2]) < 2.0)
    assert np.all((np.asarray(th[:, 3]) > -1.0)
                  & (np.asarray(th[:, 3]) < 3.0))
    np.testing.assert_allclose(T_ALL.inverse(th), u, rtol=1e-5, atol=1e-5)


def test_log_det_matches_autodiff():
    # the transform is elementwise, so det = prod of diagonal derivs;
    # check against the full autodiff Jacobian anyway
    def logdet_auto(u):
        J = jax.jacfwd(T_ALL.forward)(u)
        return jnp.linalg.slogdet(J)[1]

    for u in [jnp.array([0.5, -0.5, 1.5, -2.0]),
              jnp.array([-3.0, 2.0, -1.0, 4.0])]:
        np.testing.assert_allclose(T_ALL.log_det(u), logdet_auto(u),
                                   rtol=1e-5, atol=1e-6)


def test_batch_broadcasting():
    u = jnp.zeros((3, 7, 4))
    assert T_ALL.forward(u).shape == (3, 7, 4)
    assert T_ALL.log_det(u).shape == (3, 7)
    np.testing.assert_allclose(T_ALL.inverse(T_ALL.forward(u)), u,
                               atol=1e-6)


def test_tail_stability():
    # extreme u must not produce nan/inf in forward or log_det; the
    # free dim goes past exp's f32 overflow point (|u| > 88) — a free
    # parameter of magnitude 200 is perfectly legal and must not NaN
    # through the masked one-sided map (0·inf)
    u = jnp.array([[200.0, -50.0, 40.0, -40.0],
                   [-200.0, 30.0, -30.0, 35.0]])
    th = T_ALL.forward(u)
    ld = T_ALL.log_det(u)
    assert np.all(np.isfinite(np.asarray(th)))
    assert np.all(np.isfinite(np.asarray(ld)))
    # boxed dim saturates to its bounds, never escapes them
    assert np.asarray(th)[0, 3] <= 3.0 and np.asarray(th)[1, 3] >= -1.0


def test_validation():
    with pytest.raises(ValueError, match="d="):
        constrain()
    with pytest.raises(ValueError, match="lower < upper"):
        constrain(lower=[0.0, 1.0], upper=[1.0, 1.0])
    t = constrain(lower=0.0, d=3)
    assert t.d == 3 and t.forward(jnp.zeros(3)).shape == (3,)


def test_hmc_through_logit_recovers_beta_moments():
    # Beta(2, 4) on (0, 1): gradient samplers stall on a -inf-boxed
    # target, but sail through the logit transform
    a, b = 2.0, 4.0

    def lp(x):
        return jnp.sum((a - 1) * jnp.log(x) + (b - 1) * jnp.log1p(-x))

    t = constrain(lower=0.0, upper=1.0, d=1)
    s = bp.Hmc(transform_log_prob(lp, t), seed=0, n_chains=8,
               adapt_gens=400)
    s.run_mcmc(2400, t.inverse(jnp.array([0.5])))
    th = np.asarray(t.forward(s.get_chain(discard=800, flat=True)))
    assert np.all((th > 0) & (th < 1))
    np.testing.assert_allclose(th.mean(), a / (a + b), atol=0.02)
    var = a * b / ((a + b) ** 2 * (a + b + 1))
    np.testing.assert_allclose(th.var(), var, rtol=0.2)


def test_advi_exact_on_lognormal():
    # lognormal(mu, s) target: in u = log theta space the posterior is
    # exactly N(mu, s^2), so mean-field ADVI is exact — the transform's
    # Jacobian must be exactly right for this to land
    mu, s2 = 0.7, 0.3

    def lp(x):
        lx = jnp.log(x[0])
        return -0.5 * (lx - mu) ** 2 / s2 - lx

    t = constrain(lower=0.0, d=1)
    a = bp.Advi(transform_log_prob(lp, t), n_restarts=2, seed=0,
                step_size=0.05)
    a.run(3000, theta_0=jnp.zeros(1))
    np.testing.assert_allclose(a.mean[0], mu, atol=0.05)
    np.testing.assert_allclose(a.cov[0, 0], s2, rtol=0.15)


def test_dram_exp_transform_matches_boxed_reference():
    # positive-support Gamma(3, 2): the RW family tolerates the -inf box,
    # so the boxed run is a reference for the transformed run's moments
    k, rate = 3.0, 2.0

    def lp_boxed(x):
        ok = x[0] > 0
        safe = jnp.where(ok, x[0], 1.0)
        return jnp.where(ok, (k - 1) * jnp.log(safe) - rate * safe,
                         -jnp.inf)

    def lp_pos(x):
        return (k - 1) * jnp.log(x[0]) - rate * x[0]

    t = constrain(lower=0.0, d=1)
    s1 = bp.Dram(lp_boxed, seed=0, n_chains=8)
    s1.run_mcmc(4000, jnp.array([1.0]), cov_est=jnp.eye(1) * 0.3)
    m1 = np.asarray(s1.get_chain(discard=1500, flat=True)).mean()

    s2 = bp.Dram(transform_log_prob(lp_pos, t), seed=1, n_chains=8)
    s2.run_mcmc(4000, t.inverse(jnp.array([1.0])),
                cov_est=jnp.eye(1) * 0.3)
    th2 = np.asarray(t.forward(s2.get_chain(discard=1500, flat=True)))
    assert np.all(th2 > 0)
    np.testing.assert_allclose(th2.mean(), k / rate, atol=0.1)
    np.testing.assert_allclose(m1, k / rate, atol=0.1)
