"""Pallas blocked triangular solves: value + grad equivalence vs XLA.

Interpret mode on CPU (the Mosaic lowering itself is exercised by the
TPU-gated test at the bottom — interpret mode has hidden real lowering
bugs before, see docs/ROUND1.md)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bipymc_tpu.ops.pallas_solve import tri_solve, tri_solve_t, solve_chol

INTERPRET = jax.default_backend() != "tpu"


def _spd_chol(n, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n)).astype(np.float32) / np.sqrt(n)
    spd = a @ a.T + np.eye(n)
    return jnp.asarray(np.linalg.cholesky(spd), dtype=dtype)


@pytest.mark.parametrize("n,m,block", [(64, 1, 32), (96, 8, 32),
                                       (256, 128, 128), (200, 5, 64)])
def test_tri_solve_matches_xla(n, m, block):
    L = _spd_chol(n)
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal((n, m)).astype(np.float32))
    if m == 1:
        b = b[:, 0]
    want = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    got = tri_solve(L, b, block, True)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    want_t = jax.scipy.linalg.solve_triangular(L.T, b, lower=False)
    got_t = tri_solve_t(L, b, block, True)
    np.testing.assert_allclose(got_t, want_t, rtol=2e-4, atol=2e-4)


def test_solve_chol_matches_xla():
    n = 96
    L = _spd_chol(n, seed=3)
    b = jnp.asarray(np.random.default_rng(2).standard_normal(n),
                    dtype=jnp.float32)
    from bipymc_tpu.ops.linalg import solve_chol as solve_chol_xla
    np.testing.assert_allclose(solve_chol(L, b, 32, True),
                               solve_chol_xla(L, b), rtol=3e-4, atol=3e-4)


def test_tri_solve_grads_match_xla():
    """Custom VJPs (L̄ and b̄) against XLA autodiff of the same scalar."""
    n, m = 64, 4
    L = _spd_chol(n, seed=5)
    b = jnp.asarray(np.random.default_rng(6).standard_normal(
        (n, m)).astype(np.float32))
    w = jnp.asarray(np.random.default_rng(7).standard_normal(
        (n, m)).astype(np.float32))

    def loss_pallas(L, b):
        return jnp.sum(w * tri_solve(L, b, 32, True))

    def loss_xla(L, b):
        return jnp.sum(w * jax.scipy.linalg.solve_triangular(
            L, b, lower=True))

    gL_p, gb_p = jax.grad(loss_pallas, argnums=(0, 1))(L, b)
    gL_x, gb_x = jax.grad(loss_xla, argnums=(0, 1))(L, b)
    # XLA spreads the (irrelevant) strictly-upper cotangent; compare tril
    np.testing.assert_allclose(jnp.tril(gL_p), jnp.tril(gL_x),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(gb_p, gb_x, rtol=2e-3, atol=2e-3)

    def loss_t_pallas(L, b):
        return jnp.sum(w * tri_solve_t(L, b, 32, True))

    def loss_t_xla(L, b):
        return jnp.sum(w * jax.scipy.linalg.solve_triangular(
            L.T, b, lower=False))

    gL_p, gb_p = jax.grad(loss_t_pallas, argnums=(0, 1))(L, b)
    gL_x, gb_x = jax.grad(loss_t_xla, argnums=(0, 1))(L, b)
    np.testing.assert_allclose(jnp.tril(gL_p), jnp.tril(gL_x),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(gb_p, gb_x, rtol=2e-3, atol=2e-3)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Mosaic lowering needs real TPU")
def test_tri_solve_tpu_hardware():
    n, m = 512, 256
    L = _spd_chol(n, seed=11)
    b = jnp.asarray(np.random.default_rng(12).standard_normal(
        (n, m)).astype(np.float32))
    want = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    got = tri_solve(L, b, 128, False)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
    got_t = tri_solve_t(L, b, 128, False)
    want_t = jax.scipy.linalg.solve_triangular(L.T, b, lower=False)
    np.testing.assert_allclose(got_t, want_t, rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("n,m", [(1024, 600), (256, 2500), (512, 129)])
def test_partial_rhs_tile_covered(n, m):
    """The RHS grid must cover every column: m_pad not a multiple of the
    m_tile once floored the tile count and left trailing columns
    unwritten (NaN) — regression for the review finding."""
    rng = np.random.default_rng(1)
    a = rng.standard_normal((n, n)).astype(np.float32)
    chol = jnp.asarray(np.linalg.cholesky(
        a @ a.T + n * np.eye(n, dtype=np.float32)))
    b = jnp.asarray(rng.standard_normal((n, m)).astype(np.float32))
    x = tri_solve(chol, b, interpret=INTERPRET)
    ref = jax.scipy.linalg.solve_triangular(chol, b, lower=True)
    assert np.all(np.isfinite(np.asarray(x)))
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
