"""Linear-algebra utilities for adaptation and GP solves.

BASELINE.json:5: "adaptive proposal-covariance Cholesky updates". The AM
sampler refreshes its factor by full ``jnp.linalg.cholesky`` on an interval
(O(d³) but amortised); this module additionally provides the O(d²) rank-1
Cholesky update for callers adapting every step.
"""

import jax
import jax.numpy as jnp
from jax import lax


def chol_rank1_update(L, x, alpha=1.0):
    """Return chol(L Lᵀ + α x xᵀ) for α > 0 (rank-1 update), O(d²).

    Standard hyperbolic-rotation-free algorithm (Golub & Van Loan §6.5.4
    form), expressed as a ``lax.scan`` over columns so it jits with static
    shapes. For downdates (α < 0) fall back to a full factorisation.
    """
    d = L.shape[-1]
    x = jnp.sqrt(jnp.asarray(alpha, L.dtype)) * x

    def body(carry, k):
        L, x = carry
        lkk = L[k, k]
        xk = x[k]
        r = jnp.sqrt(lkk * lkk + xk * xk)
        c = r / lkk
        s = xk / lkk
        col = L[:, k]
        new_col = (col + s * x) / c
        new_x = c * x - s * new_col
        # only rows ≥ k change; rows < k of column k are zero anyway
        row_mask = jnp.arange(d) >= k
        L = L.at[:, k].set(jnp.where(row_mask, new_col, col))
        x = jnp.where(row_mask, new_x, x)
        return (L, x), None

    (L_out, _), _ = lax.scan(body, (L, x), jnp.arange(d))
    return L_out


def solve_chol(L, b):
    """Solve (L Lᵀ) x = b given lower Cholesky L (two triangular solves)."""
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
