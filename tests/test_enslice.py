"""Ensemble slice sampling (samplers/enslice.py) — beyond-reference.

Anchors: exact moments on a correlated Gaussian (the slice accept is
exact, so only MC error remains); the no-knobs property — a 1:100
anisotropic target sampled with the DEFAULT config recovers both
variances (the case where stretch/RW need retuning); and the zeus
μ-tuning contract — μ adapts toward expansion/contraction balance
during ``tune_gens`` and is frozen bit-exactly afterwards.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import bipymc_tpu as bp
from bipymc_tpu.samplers import enslice
from bipymc_tpu.models.targets import correlated_gaussian
from bipymc_tpu.parallel.mesh import chain_mesh

MEAN = np.array([1.0, -1.0])
COV = np.array([[2.0, 0.8], [0.8, 1.0]])


def test_moments_on_correlated_gaussian():
    s = bp.EnsembleSlice(correlated_gaussian(MEAN, COV), n_chains=32,
                         seed=0)
    s.run_mcmc(2000, jnp.zeros(2), spread=1.5)
    flat = s.get_chain(discard=700, flat=True)
    assert np.abs(flat.mean(0) - MEAN).max() < 0.2
    assert np.abs(np.cov(flat.T) - COV).max() < 0.5


def test_anisotropic_no_tuning():
    """1:100 scale ratio with the default config — the slice move's
    cost adapts (via μ and the bracket), correctness never depends on a
    proposal scale."""
    scales = jnp.array([1.0, 100.0])

    def lp(x):
        return -0.5 * jnp.sum((x / scales) ** 2)

    s = bp.EnsembleSlice(lp, n_chains=32, seed=1)
    s.run_mcmc(3000, jnp.zeros(2), spread=1.0)
    flat = s.get_chain(discard=1000, flat=True)
    var = flat.var(0)
    assert 0.6 < var[0] < 1.6, var
    assert 0.5 * 100.0 ** 2 < var[1] < 1.8 * 100.0 ** 2, var


def test_mu_tunes_then_freezes():
    s = bp.EnsembleSlice(correlated_gaussian(MEAN, COV), n_chains=16,
                         seed=2, mu0=8.0, tune_gens=300)
    s.run_mcmc(500, jnp.zeros(2), spread=1.0)
    mu_hist = np.asarray(s._history["mu"])[:, 0]    # [T] (replicated/chain)
    # a deliberately oversized mu0 must be tuned DOWN during burn-in
    assert mu_hist[299] < 8.0
    # frozen bit-exactly after tune_gens
    assert np.all(mu_hist[300:] == mu_hist[300])
    # post-freeze cost balance: expansions and contractions both occur
    ne = np.asarray(s._history["n_expand"])[300:].sum()
    nc = np.asarray(s._history["n_contract"])[300:].sum()
    assert ne > 0 and nc > 0
    assert s.mu == pytest.approx(float(mu_hist[-1]))


def test_tune_false_pins_mu():
    s = bp.EnsembleSlice(correlated_gaussian(MEAN, COV), n_chains=16,
                         seed=3, mu0=1.5, tune=False)
    s.run_mcmc(100, jnp.zeros(2), spread=1.0)
    assert np.all(np.asarray(s._history["mu"]) == 1.5)


def test_out_of_support_start_escapes():
    """Escape-accept policy: log y = -inf at a logp = -inf start, so the
    first in-support shrink draw accepts. The support must be REACHABLE
    within the bracket |t| <= 1 along mu*(x_l - x_m) — the DE direction
    confines moves to the population's affine span/scale (module
    docstring; contrast EllipticalSlice, whose nu is a fresh full-scale
    prior draw)."""
    def lp(x):
        return jnp.where(jnp.all(x > 0), -0.5 * jnp.sum(x * x), -jnp.inf)

    s = bp.EnsembleSlice(lp, n_chains=16, seed=4, mu0=5.0, tune=False)
    # every walker starts (just) out of support; support within reach
    s.run_mcmc(400, theta_0=-0.05 * jnp.ones(2), spread=0.02)
    flat = s.get_chain(discard=200, flat=True)
    assert np.all(flat > 0)
    assert np.all(np.isfinite(np.asarray(s._history["logp"])[-1]))


def test_nan_target_is_rejection():
    def lp(x):
        clean = -0.5 * jnp.sum(x * x)
        return jnp.where(x[0] > 1.0, jnp.nan, clean)

    s = bp.EnsembleSlice(lp, n_chains=16, seed=5)
    s.run_mcmc(300, jnp.zeros(2), spread=0.5)
    assert np.all(np.isfinite(s.get_chain(flat=True)))


def test_shrink_cap_falls_back_to_current_state():
    s = bp.EnsembleSlice(correlated_gaussian(MEAN, COV), n_chains=16,
                         seed=6, max_shrink=1, tune=False, mu0=50.0)
    s.run_mcmc(50, jnp.zeros(2), spread=0.5)
    acc = np.asarray(s._history["accepted"])
    assert not acc.all()          # cap hit at least once at mu=50, 1 draw
    assert np.all(np.isfinite(s.get_chain(flat=True)))


def test_mesh_equals_vmap():
    lp = correlated_gaussian(MEAN, COV)
    a = bp.EnsembleSlice(lp, n_chains=16, seed=7)
    a.run_mcmc(200, jnp.zeros(2), spread=1.0)
    b = bp.EnsembleSlice(lp, n_chains=16, seed=7, mesh=chain_mesh())
    b.run_mcmc(200, jnp.zeros(2), spread=1.0)
    np.testing.assert_array_equal(a.super_chain, b.super_chain)
    np.testing.assert_array_equal(np.asarray(a._history["mu"]),
                                  np.asarray(b._history["mu"]))


def test_rhat_early_stop():
    s = bp.EnsembleSlice(correlated_gaussian(MEAN, COV), n_chains=32,
                         seed=8)
    info = s.run_mcmc_until(jnp.zeros(2), rhat_tol=1.1, chunk=100,
                            max_chunks=60, spread=1.5)
    assert info["rhat"].max() < 1.1


def test_continuation_contract():
    lp = correlated_gaussian(MEAN, COV)
    a = bp.EnsembleSlice(lp, n_chains=16, seed=9)
    a.run_mcmc(100, jnp.zeros(2), spread=1.0)
    x_end = a.get_chain()[:, -1]                     # [chains, d]
    a.run_mcmc(50)                                   # continues silently
    assert a.get_chain().shape[1] == 150
    b = bp.EnsembleSlice(lp, n_chains=16, seed=9)
    b.run_mcmc(100, jnp.zeros(2), spread=1.0)
    with pytest.warns(UserWarning, match="IGNORED"):
        b.run_mcmc(50, theta_0=jnp.ones(2))          # start arg ignored
    np.testing.assert_array_equal(x_end, b.get_chain()[:, 99])


def test_validation():
    lp = correlated_gaussian(MEAN, COV)
    with pytest.raises(ValueError, match="even"):
        bp.EnsembleSlice(lp, n_chains=7).run_mcmc(10, jnp.zeros(2))
    with pytest.raises(ValueError, match="4 walkers"):
        bp.EnsembleSlice(lp, n_chains=2).run_mcmc(10, jnp.zeros(2))


def test_numpy_reference_one_generation():
    """Full generation against an independently-written NumPy slice
    reference consuming the IDENTICAL randomness streams (recomputed
    from the same key-fold discipline): same partners, same bracket
    sequence, same accepted points — pins the Neal budget split, the
    red-black ordering, and the shrink loop end to end."""
    from bipymc_tpu.core.rng import bits_to_uniform

    cov = np.array([[1.0, 0.3], [0.3, 0.5]])
    inv = np.linalg.inv(cov).astype(np.float32)

    def lp_np(x):
        return float(-0.5 * x @ inv @ x)

    lp_j = lambda x: -0.5 * x @ jnp.asarray(inv) @ x

    cfg = enslice.EnsliceConfig(n_chains=4, mu0=0.9, tune=False,
                                max_expand=16, max_shrink=64)
    x0 = jnp.asarray(np.linspace(-1.0, 1.0, 8).reshape(4, 2), jnp.float32)
    state = enslice.init(x0, lp_j, cfg)
    step = jax.jit(enslice.make_step(lp_j, cfg, axis_name=None))
    key = jax.random.key(123)
    new_state, info = step(state, key, jnp.zeros((), jnp.int32))

    # --- NumPy replay with the same streams ---
    def uniforms(k, n):
        return np.asarray(bits_to_uniform(
            jax.random.bits(k, (n,), jnp.uint32), jnp.float32))

    half = 2
    x = np.asarray(x0, np.float64)
    k1, k2 = jax.random.split(key)
    for k_half, first in ((k1, True), (k2, False)):
        active = (0, 1) if first else (2, 3)
        x_new = x.copy()
        for i in active:
            k_i = jax.random.fold_in(k_half, i)
            b = np.asarray(jax.random.bits(
                jax.random.fold_in(k_i, jnp.uint32(1)), (2,), jnp.uint32))
            l = int(b[0] & 0x7FFFFFFF) % half
            m = int(b[1] & 0x7FFFFFFF) % (half - 1)
            m += m >= l
            if first:
                l, m = l + half, m + half
            eta = cfg.mu0 * (x[l] - x[m])
            km = jax.random.fold_in(k_i, jnp.uint32(2))
            u = uniforms(km, 3)
            log_y = lp_np(x[i]) + np.log(u[0])
            L, R = -float(u[1]), 1.0 - float(u[1])
            j = min(int(np.floor(u[2] * cfg.max_expand)),
                    cfg.max_expand - 1)
            kb = cfg.max_expand - 1 - j
            n = 0
            while n < j and lp_np(x[i] + L * eta) > log_y:
                L -= 1.0
                n += 1
            n = 0
            while n < kb and lp_np(x[i] + R * eta) > log_y:
                R += 1.0
                n += 1
            k_loop = jax.random.fold_in(km, jnp.uint32(0x5A455553))
            for it in range(cfg.max_shrink):
                u_t = float(uniforms(jax.random.fold_in(k_loop, it), 1)[0])
                t = L + u_t * (R - L)
                xp = x[i] + t * eta
                if lp_np(xp) > log_y:
                    x_new[i] = xp
                    break
                if t < 0:
                    L = t
                else:
                    R = t
            else:
                raise AssertionError("reference hit the shrink cap")
        x = x_new

    np.testing.assert_allclose(np.asarray(new_state.x), x,
                               rtol=2e-5, atol=2e-6)
    assert np.asarray(info.accepted).all()
