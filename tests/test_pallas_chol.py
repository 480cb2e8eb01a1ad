"""Fused Pallas Cholesky ≡ jnp.linalg.cholesky (values and gradients)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bipymc_tpu.ops.pallas_chol import cholesky_pallas

INTERPRET = jax.default_backend() != "tpu"


def _spd(n, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n)).astype(dtype)
    return jnp.asarray(a @ a.T + n * np.eye(n, dtype=dtype))


@pytest.mark.parametrize("n", [4, 100, 128, 200, 256, 384])
def test_matches_jnp(n):
    k = _spd(n)
    l_ref = jnp.linalg.cholesky(k)
    l = cholesky_pallas(k, interpret=INTERPRET)
    scale = float(jnp.max(jnp.abs(l_ref)))
    np.testing.assert_allclose(np.asarray(l), np.asarray(l_ref),
                               atol=2e-5 * scale, rtol=2e-5)
    # strict upper triangle exactly zero
    assert not np.any(np.triu(np.asarray(l), 1))


def test_reconstruction():
    k = _spd(300, seed=3)
    l = cholesky_pallas(k, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(l @ l.T), np.asarray(k),
                               rtol=3e-4, atol=3e-4 * float(jnp.max(k)))


def test_gradient_matches_jnp():
    """Cholesky adjoint through a GP-log-ML-shaped scalar loss."""
    n = 96
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((n,)).astype(np.float32))

    def loss(theta, chol_fn):
        ls = jnp.exp(theta[0])
        sq = jnp.sum((x[:, None, :] - x[None, :, :]) ** 2, -1)
        k = jnp.exp(theta[1]) * jnp.exp(-0.5 * sq / ls ** 2) \
            + (0.1 + theta[2] ** 2) * jnp.eye(n)
        l = chol_fn(k)
        alpha = jax.scipy.linalg.cho_solve((l, True), y)
        return -0.5 * y @ alpha - jnp.sum(jnp.log(jnp.diag(l)))

    theta = jnp.array([0.3, -0.2, 0.1])
    g_ref = jax.grad(lambda t: loss(t, jnp.linalg.cholesky))(theta)
    g = jax.grad(lambda t: loss(
        t, lambda k: cholesky_pallas(k, interpret=INTERPRET)))(theta)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=2e-3, atol=2e-4)


def test_vmap_batched():
    ks = jnp.stack([_spd(130, seed=s) for s in range(3)])
    ls = jax.vmap(lambda k: cholesky_pallas(k, interpret=INTERPRET))(ks)
    ref = jax.vmap(jnp.linalg.cholesky)(ks)
    np.testing.assert_allclose(np.asarray(ls), np.asarray(ref),
                               atol=2e-5 * float(jnp.max(jnp.abs(ref))),
                               rtol=2e-5)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware Mosaic path")
def test_gp_regressor_pallas_chol_hardware():
    """GpRegressor(pallas_chol=True) ≡ default on the real chip."""
    from bipymc_tpu.gp.regressor import GpRegressor
    rng = np.random.default_rng(2)
    x = rng.uniform(-3, 3, (200, 2)).astype(np.float32)
    y = (np.sin(x[:, 0]) * np.cos(x[:, 1])
         + 0.1 * rng.standard_normal(200)).astype(np.float32)
    xs = rng.uniform(-3, 3, (50, 2)).astype(np.float32)
    mus = []
    for flag in (False, True):
        gp = GpRegressor(pallas_chol=flag)
        fit = gp.fit(jnp.asarray(x), jnp.asarray(y))
        mu, var = gp.predict(fit, jnp.asarray(xs))
        mus.append(np.asarray(mu))
    np.testing.assert_allclose(mus[1], mus[0], rtol=1e-3, atol=1e-3)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware Mosaic path")
def test_hardware_matches_jnp():
    for n in (256, 512, 1024):
        k = _spd(n, seed=n)
        l_ref = jnp.linalg.cholesky(k)
        l = cholesky_pallas(k, interpret=False)
        scale = float(jnp.max(jnp.abs(l_ref)))
        np.testing.assert_allclose(np.asarray(l), np.asarray(l_ref),
                                   atol=3e-5 * scale, rtol=3e-5)
