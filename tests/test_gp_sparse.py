"""Sparse variational GP (Titsias VFE) — gp/sparse.py.

Beyond-reference extension of the SURVEY.md §4.9 GP capability: the
correctness anchors are (a) Z = X collapses the bound to the exact log
marginal likelihood and the predictions to GpRegressor's, (b) the ELBO
never exceeds the exact log-ML, (c) the data-sharded path (8 fake
devices) matches the dense one bit-for-float.
"""

import numpy as np
import jax
import jax.numpy as jnp

from bipymc_tpu.gp.regressor import GpRegressor, default_params
from bipymc_tpu.gp.sparse import (SparseGpRegressor, init_inducing,
                                  elbo_sharded, fit_sharded)
from bipymc_tpu.parallel.mesh import chain_mesh


def _data(n=80, d=2, seed=0, noise=0.1):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-2, 2, (n, d)).astype(np.float32)
    y = (np.sin(x[:, 0]) + 0.5 * np.cos(2.0 * x[:, min(1, d - 1)])
         + noise * rng.standard_normal(n)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


def test_elbo_equals_exact_lml_when_z_is_x():
    x, y = _data(48)
    params = default_params(2)
    # jitter identical in both so the Z=X identity holds to rounding
    exact = GpRegressor(jitter=1e-5)
    sparse = SparseGpRegressor(jitter=1e-5)
    lml = float(exact.log_marginal_likelihood(params, x, y))
    elbo = float(sparse.elbo(params, x, x, y))
    # the SPD jitter on Kmm makes Qnn ≺ Knn, so even at Z=X the bound
    # sits a hair BELOW the exact value — assert side and closeness
    assert elbo <= lml + 1e-3, (elbo, lml)
    assert lml - elbo < 0.1, (elbo, lml)


def test_predict_equals_exact_when_z_is_x():
    x, y = _data(48)
    xs, _ = _data(33, seed=3)
    params = default_params(2)
    exact = GpRegressor(jitter=1e-5)
    sparse = SparseGpRegressor(jitter=1e-5)
    mu_e, var_e = exact.predict(exact.fit(x, y, params), xs)
    mu_s, var_s = sparse.predict(sparse.fit(x, y, x, params), xs)
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_e),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_e),
                               rtol=5e-3, atol=5e-4)


def test_elbo_is_lower_bound():
    x, y = _data(96)
    params = default_params(2)
    exact = GpRegressor(jitter=1e-5)
    sparse = SparseGpRegressor(jitter=1e-5)
    lml = float(exact.log_marginal_likelihood(params, x, y))
    z = init_inducing(jax.random.key(1), x, 16)
    elbo = float(sparse.elbo(params, z, x, y))
    assert elbo <= lml + 1e-2, (elbo, lml)
    # more inducing points tighten the bound
    z32 = init_inducing(jax.random.key(1), x, 48)
    elbo32 = float(sparse.elbo(params, z32, x, y))
    assert elbo32 >= elbo - 1e-2, (elbo, elbo32)


def test_optimize_recovers_smooth_function():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(-3, 3, (256, 1)).astype(np.float32))
    f = lambda t: np.sin(t[:, 0]) * np.exp(-0.1 * t[:, 0] ** 2)
    y = jnp.asarray((f(np.asarray(x))
                     + 0.05 * rng.standard_normal(256)).astype(np.float32))
    sparse = SparseGpRegressor(normalize_y=True)
    (p, z), elbo = sparse.optimize(x, y, m=24, steps=250, lr=0.05,
                                   key=jax.random.key(0))
    assert np.isfinite(elbo)
    fit = sparse.fit(x, y, z, p)
    xs = jnp.linspace(-3, 3, 200)[:, None].astype(jnp.float32)
    mu, var = sparse.predict(fit, xs)
    rmse = float(jnp.sqrt(jnp.mean((mu - jnp.asarray(
        f(np.asarray(xs)))) ** 2)))
    assert rmse < 0.1, rmse
    assert float(jnp.min(var)) > 0.0


def test_optimize_z_frozen():
    x, y = _data(64, d=1)
    sparse = SparseGpRegressor()
    z0 = init_inducing(jax.random.key(2), x, 12)
    (_, z), _ = sparse.optimize(x, y, z=z0, steps=40, optimize_z=False)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(z0))
    (_, z_moved), _ = sparse.optimize(x, y, z=z0, steps=40, optimize_z=True)
    assert np.abs(np.asarray(z_moved) - np.asarray(z0)).max() > 1e-6


def test_elbo_sharded_matches_dense():
    x, y = _data(96)
    params = default_params(2)
    sparse = SparseGpRegressor(normalize_y=True)
    z = init_inducing(jax.random.key(0), x, 16)
    mesh = chain_mesh()
    dense = float(sparse.elbo(params, z, x, y))
    shard = float(elbo_sharded(sparse, params, z, x, y, mesh))
    assert abs(shard - dense) < 1e-3 * abs(dense) + 1e-3, (shard, dense)


def test_elbo_sharded_handles_padding():
    x, y = _data(101)   # not divisible by 8
    params = default_params(2)
    sparse = SparseGpRegressor()
    z = init_inducing(jax.random.key(0), x, 16)
    dense = float(sparse.elbo(params, z, x, y))
    shard = float(elbo_sharded(sparse, params, z, x, y, chain_mesh()))
    assert abs(shard - dense) < 1e-3 * abs(dense) + 1e-3, (shard, dense)


def test_fit_sharded_matches_dense():
    x, y = _data(104)
    xs, _ = _data(31, seed=5)
    sparse = SparseGpRegressor(normalize_y=True)
    z = init_inducing(jax.random.key(4), x, 20)
    fit_d = sparse.fit(x, y, z)
    fit_s = fit_sharded(sparse, x, y, z, chain_mesh())
    # psum reduction order ≠ dense sum order; f32 differences amplify
    # through the m×m Cholesky — predictions below are the real check
    np.testing.assert_allclose(np.asarray(fit_s.chol_b),
                               np.asarray(fit_d.chol_b),
                               rtol=5e-3, atol=5e-4)
    mu_d, var_d = sparse.predict(fit_d, xs)
    mu_s, var_s = sparse.predict(fit_s, xs)
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_d),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_d),
                               rtol=1e-4, atol=1e-5)


def test_surrogate_log_like_vmappable():
    x, y = _data(64)
    sparse = SparseGpRegressor(normalize_y=True)
    z = init_inducing(jax.random.key(0), x, 16)
    fit = sparse.fit(x, y, z)
    ll = sparse.surrogate_log_like(fit)
    thetas = jnp.asarray(np.random.default_rng(0).uniform(
        -2, 2, (32, 2)).astype(np.float32))
    vals = jax.jit(jax.vmap(ll))(thetas)
    assert vals.shape == (32,)
    assert bool(jnp.all(jnp.isfinite(vals)))
    # matches predict mean
    mu, _ = sparse.predict(fit, thetas)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(mu),
                               rtol=1e-5, atol=1e-5)


def test_init_inducing_validates():
    x, _ = _data(10)
    import pytest
    with pytest.raises(ValueError):
        init_inducing(jax.random.key(0), x, 11)
