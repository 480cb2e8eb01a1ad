"""Extra analytic targets (funnel, eggbox) + float64 support knob."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import bipymc_tpu as bp
from bipymc_tpu.models.targets import neal_funnel, eggbox


def test_funnel_samples_wide_v_range():
    """DREAM-zs must traverse the funnel's neck-and-mouth v scale."""
    s = bp.DreamZs(neal_funnel(d=5), n_chains=16, seed=0, n_archive_init=32)
    s.run_mcmc(4000, jnp.zeros(5), spread=2.0)
    v = s.get_chain(discard=1500, flat=True)[:, 0]
    # v ~ N(0, 3^2): need mass on both sides and wide spread
    assert v.std() > 1.5
    assert abs(v.mean()) < 1.5


def test_eggbox_finds_multiple_modes():
    s = bp.DreamZs(eggbox(scale=2.0), n_chains=32, seed=1,
                   n_archive_init=64)
    s.run_mcmc(3000, jnp.zeros(2), spread=8.0)
    flat = s.get_chain(discard=1000, flat=True)
    # modes at cos=+1 pairs: (0,0), (0, ±2pi*s), ... count distinct cells
    cells = set(map(tuple, np.round(flat / (2 * np.pi * 2.0)).astype(int)
                    [::97]))
    assert len(cells) >= 2, "stuck in a single eggbox mode"


def test_float64_end_to_end():
    """SURVEY.md §9: dtype is a config knob; f64 must work end-to-end."""
    with jax.enable_x64(True):
        log_prob = lambda t: -0.5 * jnp.sum(t ** 2)
        s = bp.Dram(log_prob, seed=0, n_chains=2, dtype=jnp.float64)
        s.run_mcmc(200, jnp.zeros(3, jnp.float64),
                   cov_est=jnp.eye(3, dtype=jnp.float64))
        assert s.super_chain.dtype == np.float64
        assert np.all(np.isfinite(s.super_chain))
