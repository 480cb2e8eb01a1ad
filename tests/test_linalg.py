"""Linear-algebra utilities (BASELINE.json:5 Cholesky-update capability)."""

import jax.numpy as jnp
import numpy as np

from bipymc_tpu.ops.linalg import chol_rank1_update, solve_chol


def test_chol_rank1_update_matches_full_factorization():
    rng = np.random.default_rng(0)
    d = 6
    a = rng.normal(size=(d, d))
    cov = a @ a.T + d * np.eye(d)
    L = np.linalg.cholesky(cov)
    x = rng.normal(size=d)
    got = np.asarray(chol_rank1_update(
        jnp.asarray(L, jnp.float32), jnp.asarray(x, jnp.float32), alpha=0.5))
    want = np.linalg.cholesky(cov + 0.5 * np.outer(x, x))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    # result must stay lower-triangular
    assert np.allclose(got, np.tril(got))


def test_solve_chol():
    rng = np.random.default_rng(1)
    d = 5
    a = rng.normal(size=(d, d))
    cov = a @ a.T + d * np.eye(d)
    L = jnp.asarray(np.linalg.cholesky(cov), jnp.float32)
    b = jnp.asarray(rng.normal(size=d), jnp.float32)
    x = np.asarray(solve_chol(L, b))
    np.testing.assert_allclose(cov @ x, np.asarray(b), rtol=1e-3, atol=1e-3)
