"""Black-box host likelihoods via external_log_like (reference parity:
the reference's samplers accept any Python callable)."""

import numpy as np
import jax.numpy as jnp

import bipymc_tpu as bp
from bipymc_tpu.utils.external import external_log_like

MEAN = np.array([1.0, -1.0])
COV = np.array([[1.0, 0.4], [0.4, 0.8]])
INV = np.linalg.inv(COV)


def _np_log_like(theta):
    r = np.asarray(theta, np.float64) - MEAN
    return float(-0.5 * r @ INV @ r)


def test_external_dram_recovers_posterior():
    """A pure-NumPy scalar callable drives vmapped DRAM end to end."""
    log_like = external_log_like(_np_log_like)
    s = bp.Dram(log_like, seed=0, n_chains=4)
    s.run_mcmc(4000, jnp.zeros(2), cov_est=jnp.eye(2) * 0.5, spread=1.0)
    flat = s.get_chain(discard=1500, flat=True)
    np.testing.assert_allclose(flat.mean(axis=0), MEAN, atol=0.3)
    np.testing.assert_allclose(np.cov(flat.T), COV, atol=0.5)


def test_external_batched_dreamzs():
    """A batched host callable ([n, d] -> [n]) drives DREAM-zs."""
    def batched_fn(thetas):
        r = np.asarray(thetas, np.float64) - MEAN
        return -0.5 * np.einsum("ni,ij,nj->n", r, INV, r)

    log_like = external_log_like(batched_fn, batched=True)
    s = bp.DreamZs(log_like, n_chains=16, seed=1)
    s.run_mcmc(1500, jnp.zeros(2), spread=1.5)
    flat = s.get_chain(discard=700, flat=True)
    np.testing.assert_allclose(flat.mean(axis=0), MEAN, atol=0.3)


def test_external_matches_traceable():
    """Same math, host vs device: identical trajectories (same seeds)."""
    from bipymc_tpu.models.targets import correlated_gaussian
    dev = bp.Metropolis(correlated_gaussian(MEAN, COV), seed=5, n_chains=2)
    dev.run_mcmc(300, jnp.zeros(2), cov_est=jnp.eye(2))
    host = bp.Metropolis(external_log_like(_np_log_like), seed=5,
                         n_chains=2)
    host.run_mcmc(300, jnp.zeros(2), cov_est=jnp.eye(2))
    np.testing.assert_allclose(dev.super_chain, host.super_chain,
                               rtol=1e-5, atol=1e-6)


def test_batched_contract_on_unbatched_call():
    """batched=True fns receive [n, d] even for a single 1-d evaluation
    (regression: the un-vmapped path used to pass a bare [d] vector)."""
    import numpy as np
    import jax.numpy as jnp
    from bipymc_tpu.utils.external import external_log_like

    def fn(thetas):                      # strictly [n, d] -> [n]
        thetas = np.asarray(thetas)
        assert thetas.ndim == 2, thetas.shape
        return -0.5 * (thetas ** 2).sum(axis=1)

    ll = external_log_like(fn, batched=True)
    out = ll(jnp.array([1.0, 2.0]))
    np.testing.assert_allclose(float(out), -2.5, rtol=1e-6)
