"""Parallel tempering: mode hopping that plain DRAM cannot do."""

import numpy as np
import jax.numpy as jnp
import pytest

import bipymc_tpu as bp
from bipymc_tpu.models.targets import correlated_gaussian, gaussian_mixture
from bipymc_tpu.parallel.mesh import chain_mesh

# two well-separated modes: RW-MH at unit scale essentially never crosses
MODES = np.array([[-4.0, -4.0], [4.0, 4.0]], dtype=np.float32)


def _mode_fractions(flat):
    side = flat[:, 0] + flat[:, 1] > 0
    return np.mean(side)


def test_pt_hops_modes_where_dram_is_stuck():
    lp = gaussian_mixture(MODES, sigma=0.5)
    start = jnp.asarray([-4.0, -4.0])          # start in one mode

    stuck = bp.Dram(lp, seed=0, n_chains=4)
    stuck.run_mcmc(4000, start, cov_est=jnp.eye(2) * 0.25)
    f_stuck = _mode_fractions(stuck.get_chain(discard=500, flat=True))
    assert f_stuck < 0.05, "plain DRAM unexpectedly crossed"

    pt = bp.ParallelTempering(lp, n_temps=8, n_chains=4, seed=0,
                              beta_min=0.02, swap_interval=5, kind="dram")
    pt.run_mcmc(6000, start, cov_est=jnp.eye(2) * 0.25)
    flat = pt.get_chain(discard=1000, flat=True)
    f_pt = _mode_fractions(flat)
    assert 0.2 < f_pt < 0.8, f"cold replica mode balance {f_pt}"
    assert pt.swap_fraction > 0.01
    # both modes carry real mass and sit at the right centers
    for m in (0, 1):
        sel = (flat[:, 0] + flat[:, 1] > 0) == bool(m)
        assert sel.mean() > 0.1
        assert np.abs(flat[sel].mean(0) - MODES[m]).max() < 0.5
    # cold-replica marginal mean near the symmetric truth (0, 0)
    assert np.abs(flat.mean(0)).max() < 1.5


def test_pt_single_temperature_reduces_to_dram():
    lp = gaussian_mixture(MODES[:1], sigma=1.0)
    pt = bp.ParallelTempering(lp, n_temps=1, n_chains=4, seed=1,
                              kind="dram")
    pt.run_mcmc(2000, jnp.asarray(MODES[0]), cov_est=jnp.eye(2))
    flat = pt.get_chain(discard=500, flat=True)
    assert np.abs(flat.mean(0) - MODES[0]).max() < 0.4


def test_pt_validates_ladder():
    lp = gaussian_mixture(MODES, sigma=1.0)
    with pytest.raises(ValueError, match="betas"):
        bp.ParallelTempering(lp, betas=(0.5, 1.0))


def test_pt_ladder_diagnostics_and_until():
    """swap_rates per interface, round trips, and R-hat early stop."""
    lp = gaussian_mixture(MODES, sigma=0.5)
    pt = bp.ParallelTempering(lp, n_temps=8, n_chains=4, seed=0,
                              beta_min=0.02, swap_interval=5, kind="dram")
    pt.run_mcmc(6000, jnp.asarray([-4.0, -4.0]), cov_est=jnp.eye(2) * 0.25)

    rates = pt.swap_rates
    assert rates.shape == (7,)
    assert np.all(rates >= 0) and np.all(rates <= 1)
    assert np.all(rates > 0.05), f"dead interface: {rates}"

    # a healthy 8-rung geometric ladder on this target completes trips
    assert pt.round_trips > 0
    assert 0 < pt.round_trip_rate < 1

    # early stop on the cold replica (fresh sampler, easy unimodal target)
    lp1 = gaussian_mixture(MODES[:1], sigma=1.0)
    pt2 = bp.ParallelTempering(lp1, n_temps=4, n_chains=4, seed=3,
                               swap_interval=5, kind="am")
    info = pt2.run_mcmc_until(jnp.asarray(MODES[0]), rhat_tol=1.1,
                              chunk=100, max_chunks=50,
                              cov_est=jnp.eye(2))
    assert float(info["rhat"].max()) < 1.1
    assert int(info["steps"]) <= 5000


def test_pt_tune_ladder_flattens_rejection():
    """tune_ladder re-spaces rungs so per-interface rejection equalises
    (lower spread than the pilot's) and preserves the endpoints."""
    lp = gaussian_mixture(MODES, sigma=0.5)
    pt = bp.ParallelTempering(lp, n_temps=8, n_chains=4, seed=0,
                              beta_min=0.02, swap_interval=5, kind="dram")
    tuned = pt.tune_ladder(jnp.asarray([-4.0, -4.0]), n_pilot=4000,
                           cov_est=jnp.eye(2) * 0.25)
    b0, b1 = np.asarray(pt.cfg.betas), np.asarray(tuned.cfg.betas)
    assert b1[0] == 1.0 and abs(b1[-1] - b0[-1]) < 1e-9
    assert np.all(np.diff(b1) < 0)

    pt.run_mcmc(6000, jnp.asarray([-4.0, -4.0]), cov_est=jnp.eye(2) * 0.25)
    tuned.run_mcmc(6000, jnp.asarray([-4.0, -4.0]),
                   cov_est=jnp.eye(2) * 0.25)
    spread0 = np.std(1.0 - pt.swap_rates)
    spread1 = np.std(1.0 - tuned.swap_rates)
    assert spread1 < spread0 + 0.03, (spread0, spread1)
    assert tuned.round_trips > 0


def test_swap_rates_independent_of_thin():
    """Kept rows sit at t0 + k*thin + thin-1; with swap_interval=10 and
    thin=5 every swap round is still recorded, so the per-interface rates
    must be EXACTLY the thin=1 rates (same seed, same dynamics)."""
    import numpy as np
    import jax.numpy as jnp
    import bipymc_tpu as bp
    from bipymc_tpu.models.targets import correlated_gaussian

    lp = correlated_gaussian(jnp.array([0.0, 0.0]), jnp.eye(2))
    kw = dict(n_temps=4, n_chains=4, swap_interval=10, kind="mh", seed=3)
    a = bp.ParallelTempering(lp, **kw)
    a.run_mcmc(2000, jnp.zeros(2), cov_est=jnp.eye(2), thin=1)
    b = bp.ParallelTempering(lp, **kw)
    b.run_mcmc(2000, jnp.zeros(2), cov_est=jnp.eye(2), thin=5)
    np.testing.assert_allclose(a.swap_rates, b.swap_rates, rtol=0, atol=0)


def test_tune_ladder_rejects_unattempted_interfaces():
    """A pilot too short to attempt every DEO parity must raise a clear
    error instead of propagating NaN into the new ladder."""
    import jax.numpy as jnp
    import pytest
    import bipymc_tpu as bp
    from bipymc_tpu.models.targets import correlated_gaussian

    lp = correlated_gaussian(jnp.zeros(2), jnp.eye(2))
    pt = bp.ParallelTempering(lp, n_temps=4, n_chains=2, kind="mh",
                              swap_interval=500, seed=0)
    with pytest.raises(ValueError, match="pilot"):
        pt.tune_ladder(jnp.zeros(2), n_pilot=600)


def test_gradient_kernel_pt_hops_modes():
    """Round 3: kind="hmc" runs tempered LEAPFROG replicas — swaps carry
    the configuration (position + tempered logp + rescaled gradient,
    ∇(βℓ) = β∇ℓ) while adaptation stays with the temperature slot. The
    cold replica must populate both 10σ-separated modes and complete
    round trips."""
    means = np.array([[-5.0, 0.0], [5.0, 0.0]], np.float32)
    lp = gaussian_mixture(means, sigma=1.0)
    s = bp.ParallelTempering(lp, n_temps=6, n_chains=8, beta_min=0.02,
                             swap_interval=5, kind="hmc", seed=0,
                             n_leapfrog=8, adapt_gens=400)
    s.run_mcmc(2500, jnp.zeros(2), cov_est=jnp.eye(2), spread=1.0)
    frac = float((s.flat_chain[:, 0] < 0).mean())
    assert 0.2 < frac < 0.8, frac
    assert s.round_trips > 0
    assert np.all(s.swap_rates > 0.1)


def test_mala_kind_runs_and_checkpoints():
    lp = correlated_gaussian(jnp.zeros(2), jnp.eye(2))
    m = bp.ParallelTempering(lp, n_temps=4, n_chains=4, beta_min=0.05,
                             kind="mala", seed=1, adapt_gens=100)
    m.run_mcmc(300, jnp.zeros(2), cov_est=jnp.eye(2))
    assert np.all(np.isfinite(m.flat_chain))
    from bipymc_tpu.utils.checkpoint import save_sampler, restore_sampler
    import tempfile, os as _os
    with tempfile.TemporaryDirectory() as td:
        p = _os.path.join(td, "ck.npz")
        save_sampler(p, m)
        m2 = bp.ParallelTempering(lp, n_temps=4, n_chains=4,
                                  beta_min=0.05, kind="mala", seed=1,
                                  adapt_gens=100)
        restore_sampler(p, m2)
        m.run_mcmc(50)
        m2.run_mcmc(50)
        np.testing.assert_array_equal(m.super_chain[:, -50:],
                                      m2.super_chain)


def test_gradient_kernel_pt_mesh_runs():
    """kind="hmc" on the chain mesh: the double-vmapped leapfrog kernels
    compile and execute under shard_map with the ladder replicated."""
    lp = correlated_gaussian(jnp.zeros(2), jnp.eye(2))
    g = bp.ParallelTempering(lp, n_temps=4, n_chains=8, beta_min=0.05,
                             kind="hmc", seed=2, n_leapfrog=4,
                             mesh=chain_mesh())
    g.run_mcmc(100, jnp.zeros(2), cov_est=jnp.eye(2))
    assert np.all(np.isfinite(g.flat_chain))
