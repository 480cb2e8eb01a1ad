"""Sharded GP build/predict equals the single-device path (8 fake devices).

SURVEY.md §3.1 stretch: shard kernel-matrix rows over devices. These run
on the 8-virtual-CPU-device mesh from conftest.
"""

import numpy as np
import jax
import jax.numpy as jnp

from bipymc_tpu.gp.regressor import GpRegressor
from bipymc_tpu.gp.sharded import fit_sharded, predict_sharded, sharded_gram
from bipymc_tpu.parallel.mesh import chain_mesh


def _data(n=100, d=3, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-2, 2, (n, d)).astype(np.float32)
    y = (np.sin(x[:, 0]) + 0.1 * rng.standard_normal(n)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


def test_sharded_gram_matches_dense():
    x, _ = _data(96)
    gp = GpRegressor()
    from bipymc_tpu.gp.regressor import default_params
    params = default_params(3)
    mesh = chain_mesh()
    got = np.asarray(sharded_gram(gp, params, x, mesh))
    want = np.asarray(gp._gram(params, x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_sharded_gram_handles_row_padding():
    x, _ = _data(101)   # not divisible by 8 devices
    gp = GpRegressor()
    from bipymc_tpu.gp.regressor import default_params
    params = default_params(3)
    got = np.asarray(sharded_gram(gp, params, x, chain_mesh()))
    want = np.asarray(gp._gram(params, x))
    assert got.shape == (101, 101)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fit_predict_sharded_match_single_device():
    x, y = _data(96)
    xs, _ = _data(52, seed=1)
    gp = GpRegressor(normalize_y=True)
    mesh = chain_mesh()

    fit_s = fit_sharded(gp, x, y, mesh)
    fit_d = gp.fit(x, y)
    np.testing.assert_allclose(np.asarray(fit_s.chol),
                               np.asarray(fit_d.chol), rtol=1e-4, atol=1e-5)

    mu_s, var_s = predict_sharded(gp, fit_s, xs, mesh)
    mu_d, var_d = gp.predict(fit_d, xs)
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_d),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_d),
                               rtol=1e-4, atol=1e-4)
