"""Fused accept/update kernel ≡ the jnp chain, bit for bit.

All ops in the kernel are exact (compare/select/min/add), so equality is
exact — including the NaN/-inf hard-reject edge. The dreamzs_pallas
golden additionally pins the kernel inside the full engine.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bipymc_tpu.ops.accept_select import accept_select_pallas

INTERPRET = jax.default_backend() != "tpu"


def _reference(x, x_star, logp, logp_star, log_jac, log_u, logp_sum):
    log_alpha = jnp.minimum(0.0, logp_star - logp + log_jac)
    log_alpha = jnp.where(jnp.isfinite(logp_star), log_alpha, -jnp.inf)
    acc = log_u < log_alpha
    x_new = jnp.where(acc[:, None], x_star, x)
    logp_new = jnp.where(acc, logp_star, logp)
    return x_new, logp_new, logp_sum + logp_new, acc


def test_matches_jnp_chain_exactly():
    n, d = 200, 37
    key = jax.random.key(0)
    ks = jax.random.split(key, 7)
    x = jax.random.normal(ks[0], (n, d))
    x_star = jax.random.normal(ks[1], (n, d))
    logp = jax.random.normal(ks[2], (n,)) * 10
    logp_star = jax.random.normal(ks[3], (n,)) * 10
    # non-finite proposals must hard-reject
    logp_star = logp_star.at[3].set(jnp.nan).at[7].set(-jnp.inf)
    logp_star = logp_star.at[11].set(jnp.inf)
    log_jac = jax.random.normal(ks[4], (n,)) * 0.1
    log_u = jnp.log(jax.random.uniform(ks[5], (n,)))
    logp_sum = jax.random.normal(ks[6], (n,))

    ref = _reference(x, x_star, logp, logp_star, log_jac, log_u, logp_sum)
    out = accept_select_pallas(x, x_star, logp, logp_star, log_jac,
                               log_u, logp_sum, interpret=INTERPRET)
    for a, b in zip(out, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not bool(out[3][3]) and not bool(out[3][11])  # NaN/inf rejected


import pytest


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware Mosaic path")
def test_hardware_matches_jnp_chain():
    n, d = 256, 100
    key = jax.random.key(1)
    ks = jax.random.split(key, 7)
    args = (jax.random.normal(ks[0], (n, d)),
            jax.random.normal(ks[1], (n, d)),
            jax.random.normal(ks[2], (n,)) * 10,
            jax.random.normal(ks[3], (n,)) * 10,
            jax.random.normal(ks[4], (n,)) * 0.1,
            jnp.log(jax.random.uniform(ks[5], (n,))),
            jax.random.normal(ks[6], (n,)))
    ref = _reference(*args)
    out = accept_select_pallas(*args, interpret=False)
    for a, b in zip(out, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_engine_equality_with_pallas_accept():
    """pallas_accept=True inside the full DREAM-zs engine tracks the
    default XLA accept chain. The KERNEL is exact (bit-equality pinned
    above on identical inputs); at engine level the two variants are
    different XLA programs, so the surrounding proposal math may fuse
    with different float re-association — tolerance reflects that, not
    the kernel."""
    from bipymc_tpu.models.targets import correlated_gaussian
    from bipymc_tpu.samplers import dream
    from bipymc_tpu.core.scan import run_scan

    lp = correlated_gaussian(np.array([1.0, -1.0]),
                             np.array([[1.0, 0.3], [0.3, 0.8]]))
    key = jax.random.key(3)
    x0 = 2.0 * jax.random.normal(key, (8, 2), jnp.float32)

    outs = []
    for pallas_accept in (False, True):
        cfg = dream.DreamConfig(n_chains=8, burnin_gens=30,
                                pallas_accept=pallas_accept)
        state = dream.init(x0, lp, cfg, archive_capacity=64, z0=x0)
        step = dream.make_step(lp, cfg)
        final, hist = jax.jit(lambda s, k: run_scan(
            step, s, k, 60, collect_fn=lambda s, i: s.x))(
                state, jax.random.key(9))
        outs.append(np.asarray(hist))
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-4, atol=2e-5)
