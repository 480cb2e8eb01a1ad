"""Batched Pallas Cholesky (ops/pallas_bchol) — correctness + dispatch.

Forward values must match jnp.linalg.cholesky to f32 roundoff for every
batch/size mix (including batch and size padding); the VJP must match
jax's cholesky cotangent; the GpRegressor custom_vmap dispatch must leave
un-vmapped and grad paths on XLA (off-TPU the rule always falls back, so
CPU tests exercise the routing logic, interpret mode the kernel).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bipymc_tpu.ops.pallas_bchol import cholesky_batched_pallas

INTERPRET = jax.default_backend() != "tpu"


def _spd(b, n, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((b, n, 24)).astype(dtype)
    return x @ np.swapaxes(x, -1, -2) / 24 + 3 * np.eye(n, dtype=dtype)


@pytest.mark.parametrize("b,n", [(3, 64), (8, 128), (5, 200), (12, 256)])
def test_forward_matches_jnp(b, n):
    k = _spd(b, n, seed=n + b)
    got = np.asarray(cholesky_batched_pallas(jnp.asarray(k),
                                             interpret=INTERPRET))
    want = np.linalg.cholesky(k)
    scale = np.max(np.abs(want))
    np.testing.assert_allclose(got, want, atol=5e-6 * scale)
    # strict upper triangle exactly zero
    assert np.all(np.triu(got, 1) == 0.0)


def test_vjp_matches_jax_cholesky():
    k = _spd(4, 96, seed=7)

    def f_ours(a):
        l = cholesky_batched_pallas(a, INTERPRET)
        return jnp.sum(jnp.sin(l) * 0.3 + l ** 2)

    def f_jax(a):
        l = jax.vmap(jnp.linalg.cholesky)(a)
        return jnp.sum(jnp.sin(l) * 0.3 + l ** 2)

    g_ours = jax.grad(f_ours)(jnp.asarray(k))
    g_jax = jax.grad(f_jax)(jnp.asarray(k))
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_jax),
                               rtol=2e-4, atol=2e-5)


def test_regressor_dispatch_gates():
    """The custom_vmap dispatch must (a) keep un-vmapped/grad paths on
    XLA everywhere, (b) fall back under vmap off-TPU, and (c) keep the
    GP's vmapped log-ML numerically identical either way."""
    from bipymc_tpu.gp.regressor import GpRegressor

    rng = np.random.default_rng(3)
    x = rng.uniform(-2, 2, (64, 2)).astype(np.float32)
    y = np.sin(x[:, 0]).astype(np.float32)
    xj, yj = jnp.asarray(x), jnp.asarray(y)

    gp_on = GpRegressor(batched_chol=True)
    gp_off = GpRegressor(batched_chol=False)
    p = {"log_lengthscale": jnp.zeros(2), "log_sigma_f": jnp.zeros(()),
         "log_sigma_n": jnp.asarray(-2.3)}

    # un-vmapped log-ML identical, and public API still differentiable
    a = float(gp_on.log_marginal_likelihood(p, xj, yj))
    b = float(gp_off.log_marginal_likelihood(p, xj, yj))
    assert a == b
    g = jax.grad(lambda pp: gp_on._lml_impl(pp, xj, yj, grad_safe=True))(p)
    assert np.isfinite(float(g["log_sigma_f"]))

    # vmapped over a batch of 8 param sets (the config-4 shape)
    thetas = jnp.asarray(rng.normal(0, 0.1, (8, 4)).astype(np.float32))

    def lp(gp):
        def one(t):
            pp = {"log_lengthscale": t[:2], "log_sigma_f": t[2],
                  "log_sigma_n": t[3]}
            return gp._lml_impl(pp, xj, yj)
        return jax.jit(jax.vmap(one))(thetas)

    np.testing.assert_allclose(np.asarray(lp(gp_on)),
                               np.asarray(lp(gp_off)), rtol=1e-6)

    # hyperopt (grad path) still runs with dispatch enabled
    params, lml = gp_on.optimize(xj, yj, steps=30, lr=0.1)
    assert np.isfinite(float(lml))


# ---- fused factor + forward solve (cholesky_solve_batched_pallas) ----------

def test_chol_solve_forward_matches():
    from bipymc_tpu.ops.pallas_bchol import cholesky_solve_batched_pallas
    for b, n in [(3, 64), (8, 128), (5, 200), (12, 256)]:
        k = _spd(b, n, seed=n + 2 * b)
        rng = np.random.default_rng(n)
        y = rng.standard_normal((b, n)).astype(np.float32)
        l, z = cholesky_solve_batched_pallas(
            jnp.asarray(k), jnp.asarray(y), INTERPRET)
        l, z = np.asarray(l), np.asarray(z)
        # the matrix path is the IDENTICAL computation to the plain
        # kernel — bit-equal, not merely close
        l_plain = np.asarray(
            cholesky_batched_pallas(jnp.asarray(k), INTERPRET))
        assert np.array_equal(l, l_plain)
        want_l = np.linalg.cholesky(k)
        want_z = np.stack([
            np.linalg.solve(want_l[i], y[i]) for i in range(b)])
        scale = np.max(np.abs(want_z))
        np.testing.assert_allclose(z, want_z, atol=1e-5 * scale)


def test_chol_solve_vjp_matches_xla():
    from bipymc_tpu.ops.pallas_bchol import cholesky_solve_batched_pallas
    k = _spd(4, 96, seed=11)
    rng = np.random.default_rng(5)
    y = rng.standard_normal((4, 96)).astype(np.float32)

    def f_ours(a, yy):
        l, z = cholesky_solve_batched_pallas(a, yy, INTERPRET)
        return jnp.sum(z ** 2) + jnp.sum(jnp.log(
            jnp.diagonal(l, axis1=-2, axis2=-1)))

    def f_xla(a, yy):
        l = jax.vmap(jnp.linalg.cholesky)(a)
        z = jax.vmap(lambda c, b: jax.scipy.linalg.solve_triangular(
            c, b, lower=True))(l, yy)
        return jnp.sum(z ** 2) + jnp.sum(jnp.log(
            jnp.diagonal(l, axis1=-2, axis2=-1)))

    ga, gy = jax.grad(f_ours, argnums=(0, 1))(jnp.asarray(k),
                                              jnp.asarray(y))
    wa, wy = jax.grad(f_xla, argnums=(0, 1))(jnp.asarray(k),
                                             jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(gy), np.asarray(wy),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(wa),
                               rtol=2e-4, atol=2e-4)


def test_lml_fused_dispatch_grad_paths():
    """grad through the vmapped AND un-vmapped non-grad_safe log-ML must
    work with the fused dispatch in place (custom_jvp wrapper), matching
    the grad_safe XLA path."""
    from bipymc_tpu.gp.regressor import GpRegressor
    rng = np.random.default_rng(9)
    x = rng.uniform(-2, 2, (48, 2)).astype(np.float32)
    y = np.cos(x[:, 0]).astype(np.float32)
    xj, yj = jnp.asarray(x), jnp.asarray(y)
    gp = GpRegressor(batched_chol=True)

    def lml_t(t):
        p = {"log_lengthscale": t[:2], "log_sigma_f": t[2],
             "log_sigma_n": t[3]}
        return gp._lml_impl(p, xj, yj)          # grad_safe=False path

    def lml_safe(t):
        p = {"log_lengthscale": t[:2], "log_sigma_f": t[2],
             "log_sigma_n": t[3]}
        return gp._lml_impl(p, xj, yj, grad_safe=True)

    t0 = jnp.asarray([0.1, -0.2, 0.05, -2.0], jnp.float32)
    g = jax.grad(lml_t)(t0)                     # un-vmapped grad
    gs = jax.grad(lml_safe)(t0)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gs),
                               rtol=1e-4, atol=1e-5)
    ts = jnp.stack([t0, t0 + 0.03])
    gv = jax.vmap(jax.grad(lml_t))(ts)          # vmap-of-grad
    gvs = jax.vmap(jax.grad(lml_safe))(ts)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gvs),
                               rtol=1e-4, atol=1e-5)
