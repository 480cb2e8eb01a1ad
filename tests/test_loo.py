"""PSIS-LOO cross-validation — utils/loo.py.

Anchor: a conjugate normal-normal model where the exact leave-one-out
predictive density is available in closed form — elpd_loo must match it
within Monte-Carlo tolerance using exact posterior draws (no MCMC noise
in the check). loo_compare must rank the true model above a
mis-specified one with a paired-difference SE that certifies the gap.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bipymc_tpu.utils.loo import loo, loo_compare, pointwise_loglik, waic


def _normal_logpdf(y, mu, var):
    return -0.5 * ((y - mu) ** 2 / var + np.log(2 * np.pi * var))


def _conjugate_case(seed=0, n=40, sigma=1.0, tau=3.0, mu_true=1.5):
    """y_i ~ N(mu, sigma²), prior mu ~ N(0, tau²). Returns data, exact
    posterior (mean, var), and the closed-form exact elpd_loo."""
    rng = np.random.default_rng(seed)
    y = rng.normal(mu_true, sigma, size=n)

    def posterior(ys):
        m = len(ys)
        prec = 1.0 / tau**2 + m / sigma**2
        mean = (np.sum(ys) / sigma**2) / prec
        return mean, 1.0 / prec

    # exact LOO: posterior from y_-i, predictive N(mu_-i, v_-i + sigma²)
    elpd_exact = 0.0
    for i in range(n):
        m_i, v_i = posterior(np.delete(y, i))
        elpd_exact += _normal_logpdf(y[i], m_i, v_i + sigma**2)
    post_mean, post_var = posterior(y)
    return y, (post_mean, post_var), elpd_exact


def test_loo_matches_closed_form_conjugate():
    y, (pm, pv), elpd_exact = _conjugate_case()
    rng = np.random.default_rng(1)
    draws = rng.normal(pm, np.sqrt(pv), size=(4000, 1))  # exact posterior

    yj = jnp.asarray(y)

    def ll(theta):
        return -0.5 * ((yj - theta[0]) ** 2 + np.log(2 * np.pi))

    mat = pointwise_loglik(ll, draws)
    assert mat.shape == (4000, len(y))
    out = loo(mat)
    # MC error of elpd with 4000 exact draws and a 1-param model is tiny
    assert abs(float(out["elpd_loo"]) - elpd_exact) < 0.15, (
        float(out["elpd_loo"]), elpd_exact)
    # one parameter → p_loo ≈ 1
    assert 0.4 < float(out["p_loo"]) < 2.0, float(out["p_loo"])
    # well-specified conjugate case: every point reliable
    assert int(out["n_bad"]) == 0, np.asarray(out["khat"])
    assert float(out["se"]) > 0.0


def test_loo_shape_validation():
    with pytest.raises(ValueError):
        loo(jnp.zeros(10))


def test_loo_compare_ranks_true_model_first():
    y, (pm, pv), _ = _conjugate_case(seed=2, n=60)
    rng = np.random.default_rng(3)
    draws = rng.normal(pm, np.sqrt(pv), size=(3000, 1))
    yj = jnp.asarray(y)

    def ll_true(theta):
        return -0.5 * ((yj - theta[0]) ** 2 + np.log(2 * np.pi))

    def ll_bad(theta):
        # mis-specified: ignores the data's location entirely (mu fixed 0
        # with inflated variance to give it a fighting chance)
        del theta
        return -0.5 * (yj**2 / 4.0 + np.log(2 * np.pi * 4.0))

    res = {
        "true": loo(pointwise_loglik(ll_true, draws)),
        "fixed0": loo(pointwise_loglik(ll_bad, draws)),
    }
    table = loo_compare(res)
    assert table[0]["name"] == "true"
    assert table[0]["d_elpd"] == 0.0 and table[0]["d_se"] == 0.0
    gap = table[1]
    assert gap["d_elpd"] > 0.0
    # the gap should be certified: |d_elpd| > 2·d_se for this contrast
    assert gap["d_elpd"] > 2.0 * gap["d_se"], (gap["d_elpd"], gap["d_se"])


def test_loo_compare_rejects_mismatched_n():
    a = loo(jnp.asarray(np.random.default_rng(0).normal(size=(200, 8))))
    b = loo(jnp.asarray(np.random.default_rng(1).normal(size=(200, 9))))
    with pytest.raises(ValueError):
        loo_compare({"a": a, "b": b})
    with pytest.raises(ValueError):
        loo_compare({})


def test_loo_flags_influential_point():
    # plant a gross outlier: leaving it out reshapes the posterior, so
    # its importance ratios are heavy-tailed and k̂ must flag it
    y, (pm, pv), _ = _conjugate_case(seed=4, n=30)
    y = np.concatenate([y, [25.0]])
    prec = 1.0 / 9.0 + len(y) / 1.0
    pm = (np.sum(y) / 1.0) / prec
    pv = 1.0 / prec
    rng = np.random.default_rng(5)
    draws = rng.normal(pm, np.sqrt(pv), size=(2000, 1))
    yj = jnp.asarray(y)

    def ll(theta):
        return -0.5 * ((yj - theta[0]) ** 2 + np.log(2 * np.pi))

    out = loo(pointwise_loglik(ll, draws))
    khat = np.asarray(out["khat"])
    # the outlier's khat should be the largest by a margin
    assert int(np.argmax(khat)) == len(y) - 1, khat


def test_loo_jits():
    mat = jnp.asarray(np.random.default_rng(6).normal(size=(500, 12)))
    out = jax.jit(loo)(mat)
    ref = loo(mat)
    np.testing.assert_allclose(np.asarray(out["elpd_loo"]),
                               np.asarray(ref["elpd_loo"]), rtol=1e-5)


def test_waic_matches_loo_on_well_specified_model():
    # In the well-specified regular regime WAIC and PSIS-LOO estimate the
    # same quantity (Vehtari 2017 §2.2) — they must agree within MC noise,
    # and p_waic must recover the parameter count like p_loo does.
    y, (pm, pv), elpd_exact = _conjugate_case(seed=7, n=50)
    rng = np.random.default_rng(8)
    draws = rng.normal(pm, np.sqrt(pv), size=(4000, 1))
    yj = jnp.asarray(y)

    def ll(theta):
        return -0.5 * ((yj - theta[0]) ** 2 + np.log(2 * np.pi))

    mat = pointwise_loglik(ll, draws)
    w, l = waic(mat), loo(mat)
    assert abs(float(w["elpd_waic"]) - float(l["elpd_loo"])) < 0.1
    assert abs(float(w["elpd_waic"]) - elpd_exact) < 0.2
    assert 0.4 < float(w["p_waic"]) < 2.0, float(w["p_waic"])
    assert int(w["n_bad"]) == 0


def test_waic_compare_and_no_mixing():
    rng = np.random.default_rng(9)
    mat_a = jnp.asarray(rng.normal(-1.0, 0.1, size=(300, 20)))
    mat_b = jnp.asarray(rng.normal(-2.0, 0.1, size=(300, 20)))
    table = loo_compare({"a": waic(mat_a), "b": waic(mat_b)})
    assert table[0]["name"] == "a" and table[1]["d_elpd"] > 0
    assert "elpd_waic" in table[0] and "p_waic" in table[0]
    with pytest.raises(ValueError):
        loo_compare({"a": waic(mat_a), "b": loo(mat_b)})


def test_waic_jits_and_flags_high_variance_point():
    rng = np.random.default_rng(10)
    base = rng.normal(-1.0, 0.2, size=(500, 10))
    base[:, 3] = rng.normal(-2.0, 2.0, size=500)  # p_waic_i ≈ 4 ≫ 0.4
    mat = jnp.asarray(base)
    out = jax.jit(waic)(mat)
    assert int(out["n_bad"]) >= 1
    assert int(np.argmax(np.asarray(out["p_waic_i"]))) == 3
