"""Device-sharded GP fit/predict — the tensor-parallel stretch goal.

SURVEY.md §3.1: the reference has no tensor parallelism (nothing to
shard), but the GP's O(n²d) kernel-matrix build is the one place worth
sharding for n ≳ 10⁴ training points. Strategy:

- the Gram matrix is built in *row blocks* under ``jax.shard_map`` — each
  device computes ``kernel(params, x_local, x_full)`` for its slice of
  training rows, so build FLOPs and peak memory divide by the device
  count (and each block rides the device's own MXU);
- the O(n³) Cholesky stays replicated (XLA has no distributed Cholesky;
  for GP-scale n the factorisation fits one chip once the build is paid);
- prediction shards *test* points — embarrassingly parallel.

Numerics match the single-device path exactly (tested on the 8-fake-CPU
mesh in tests/test_gp_sharded.py).
"""

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bipymc_tpu.gp.regressor import GpFit
from bipymc_tpu.parallel.mesh import CHAIN_AXIS


def _pad_rows(a, mult):
    n = a.shape[0]
    pad = (-n) % mult
    if pad:
        a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
    return a, n


def sharded_gram(gp, params, x, mesh: Mesh, axis: str = CHAIN_AXIS):
    """Gram matrix of ``x`` [n, d] built in row blocks over ``mesh``.

    Returns the full (replicated) [n, n] matrix including the noise/jitter
    diagonal — ready for a replicated Cholesky.
    """
    n_dev = mesh.devices.size
    xp, n = _pad_rows(x, n_dev)

    def block(x_local, x_full):
        return gp.kernel(params, x_local, x_full)       # [n_local, n_pad]

    gram_padded = jax.jit(jax.shard_map(
        block, mesh=mesh, in_specs=(P(axis, None), P()),
        out_specs=P(axis, None)))(xp, xp)
    k = gram_padded[:n, :n]
    sn2 = jnp.exp(2.0 * params["log_sigma_n"])
    sf2 = jnp.exp(2.0 * params["log_sigma_f"])
    return k + (sn2 + gp.jitter * sf2) * jnp.eye(n, dtype=k.dtype)


def fit_sharded(gp, x, y, mesh: Mesh, params=None, axis: str = CHAIN_AXIS):
    """Sharded-build fit: same result/GpFit as ``gp.fit`` (bitwise up to
    reduction order), with the kernel build distributed over ``mesh``."""
    from bipymc_tpu.gp.regressor import default_params
    x = jnp.atleast_2d(x)
    y = jnp.asarray(y)
    if params is None:
        params = default_params(x.shape[-1], dtype=x.dtype)
    yn, y_mean, y_std = gp._normalize(y)
    kmat = sharded_gram(gp, params, x, mesh, axis)
    chol = jnp.linalg.cholesky(kmat)
    v = jax.scipy.linalg.solve_triangular(chol, yn, lower=True)
    alpha = jax.scipy.linalg.solve_triangular(chol.T, v, lower=False)
    return GpFit(params=params, x=x, chol=chol, alpha=alpha,
                 y_mean=y_mean, y_std=y_std)


def predict_sharded(gp, fit: GpFit, xs, mesh: Mesh,
                    axis: str = CHAIN_AXIS):
    """Posterior mean/var at [m, d] test points, sharded over test rows."""
    xs = jnp.atleast_2d(xs)
    xsp, m = _pad_rows(xs, mesh.devices.size)

    def block(xs_local):
        ks = gp.kernel(fit.params, fit.x, xs_local)     # [n, m_local]
        mu = ks.T @ fit.alpha
        w = jax.scipy.linalg.solve_triangular(fit.chol, ks, lower=True)
        sf2 = jnp.exp(2.0 * fit.params["log_sigma_f"])
        var = jnp.maximum(sf2 - jnp.sum(w * w, axis=0), 1e-12)
        return fit.y_mean + fit.y_std * mu, fit.y_std ** 2 * var

    mu, var = jax.jit(jax.shard_map(
        block, mesh=mesh, in_specs=P(axis, None),
        out_specs=(P(axis), P(axis))))(xsp)
    return mu[:m], var[:m]
