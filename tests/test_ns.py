"""Nested sampling (samplers/ns.py) — beyond-reference.

Validation targets live on the unit-hypercube contract: uniform prior
over a cube via an affine ``prior_transform``, so every evidence has a
closed form (logZ = log mean cube likelihood) to test against, with
the run's own √(H/K) error bar setting the tolerance.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import bipymc_tpu as bp
from bipymc_tpu.samplers import ns
from bipymc_tpu.parallel.mesh import chain_mesh

SIDE = 20.0            # prior cube [-10, 10]^d


def prior_transform(u):
    return SIDE * u - 0.5 * SIDE


def gauss_loglike(d):
    c = -0.5 * d * math.log(2.0 * math.pi)

    def log_like(th):
        return c - 0.5 * jnp.sum(th * th)

    return log_like


@pytest.mark.parametrize("kernel,n_mcmc", [("slice", 8), ("walk", 25)])
def test_gaussian_evidence_and_moments(kernel, n_mcmc):
    """Unit Gaussian likelihood in the cube: logZ = -d·log(SIDE) (the
    Gaussian mass outside [-10,10] is ~1e-23), posterior = N(0, I).
    The estimate must land within 3.5 of its own √(H/K) error bar and
    the weighted samples must reproduce the posterior moments. Both
    replacement kernels, at the rep counts the §39 bias study
    established for this dimension (slice ≈ 2d direction updates;
    the γ-adapted walk needs ~3× the evals for the same bias)."""
    d = 4
    s = bp.NestedSampler(gauss_loglike(d), prior_transform, d,
                         n_live=512, n_batch=32, n_mcmc=n_mcmc,
                         max_batches=400, seed=0, kernel=kernel)
    info = s.run()
    assert info["terminated"]
    logz_true = -d * math.log(SIDE)
    err = info["log_evidence_err"]
    assert 0.01 < err < 0.5
    assert abs(info["log_evidence"] - logz_true) < 3.5 * err

    w = np.exp(s.log_weights)
    w = np.where(np.isfinite(w), w, 0.0)
    th = s.samples
    mean = (w[:, None] * th).sum(0) / w.sum()
    var = (w[:, None] * th ** 2).sum(0) / w.sum() - mean ** 2
    assert np.all(np.abs(mean) < 0.1)
    assert np.all(np.abs(var - 1.0) < 0.15)
    if kernel == "walk":
        # the constrained-walk acceptance adapted toward its target
        assert 0.25 < float(info["acceptance"][-1]) < 0.75
    else:
        # slice moves succeed by construction (shrink-cap fallbacks
        # are the rare exception)
        assert float(info["acceptance"][-1]) > 0.9


def test_mixture_mode_weights_and_evidence():
    """The flagship property: two well-separated modes keep their
    0.7/0.3 mass (no inter-mode mixing required — the likelihood floor
    rises through both basins), and the evidence is the mixture's
    normalisation over the cube."""
    d = 2
    m1 = jnp.asarray([-5.0, -5.0])
    m2 = jnp.asarray([5.0, 5.0])
    c = -0.5 * d * math.log(2.0 * math.pi)

    def log_like(th):
        l1 = math.log(0.7) + c - 0.5 * jnp.sum((th - m1) ** 2)
        l2 = math.log(0.3) + c - 0.5 * jnp.sum((th - m2) ** 2)
        return jnp.logaddexp(l1, l2)

    s = bp.NestedSampler(log_like, prior_transform, d,
                         n_live=512, n_batch=32, n_mcmc=6,
                         max_batches=400, seed=1)
    info = s.run()
    assert info["terminated"]
    logz_true = -d * math.log(SIDE)
    assert abs(info["log_evidence"] - logz_true) \
        < 3.5 * info["log_evidence_err"]

    w = np.exp(s.log_weights)
    w = np.where(np.isfinite(w), w, 0.0)
    w = w / w.sum()
    near_1 = np.sum((s.samples - np.asarray(m1)) ** 2, axis=1) < 25.0
    w1 = float(w[near_1].sum())
    assert abs(w1 - 0.7) < 0.08, w1


def test_batched_bookkeeping_matches_b1():
    """The batched (B>1) volume ladder is the exact sequential view:
    on the same target and comparable budgets, B=16 and B=1 agree on
    the evidence within their joint error bars (they cannot be
    bit-equal — different death schedules — so this pins the
    bookkeeping, not the RNG)."""
    d = 2
    log_like = gauss_loglike(d)
    out = {}
    for b in (1, 16):
        s = bp.NestedSampler(log_like, prior_transform, d,
                             n_live=128, n_batch=b, n_mcmc=6,
                             max_batches=4000 // max(b, 1), seed=3)
        info = s.run()
        assert info["terminated"]
        out[b] = (info["log_evidence"], info["log_evidence_err"])
    gap = abs(out[1][0] - out[16][0])
    joint = math.hypot(out[1][1], out[16][1])
    assert gap < 3.5 * joint, (out, gap, joint)


def test_mesh_matches_vmap():
    """Sharding the replacement walkers must not change the run:
    per-walker RNG folds by global index and all live-set decision math
    is replicated (gather-then-reduce), so mesh and vmap agree on the
    batch count exactly and on the evidence to float tolerance."""
    d = 2
    log_like = gauss_loglike(d)
    kw = dict(n_live=256, n_batch=32, n_mcmc=6, max_batches=300,
              seed=5)
    a = bp.NestedSampler(log_like, prior_transform, d, **kw)
    ia = a.run()
    b = bp.NestedSampler(log_like, prior_transform, d,
                         mesh=chain_mesh(), **kw)
    ib = b.run()
    assert ia["n_batches"] == ib["n_batches"]
    assert abs(ia["log_evidence"] - ib["log_evidence"]) < 1e-4
    np.testing.assert_allclose(a.log_weights, b.log_weights,
                               rtol=0, atol=1e-4)


def test_deterministic_and_validation():
    d = 2
    log_like = gauss_loglike(d)
    kw = dict(n_live=128, n_batch=16, n_mcmc=4, max_batches=200,
              seed=7)
    r1 = bp.NestedSampler(log_like, prior_transform, d, **kw).run()
    r2 = bp.NestedSampler(log_like, prior_transform, d, **kw).run()
    assert r1["log_evidence"] == r2["log_evidence"]
    assert r1["n_batches"] == r2["n_batches"]

    with pytest.raises(ValueError, match="n_batch"):
        bp.NestedSampler(log_like, prior_transform, d,
                         n_live=64, n_batch=48)
    with pytest.raises(ValueError, match="kernel"):
        bp.NestedSampler(log_like, prior_transform, d, n_live=64,
                         n_batch=16, kernel="bogus")
    with pytest.raises(ValueError, match="divisible"):
        bp.NestedSampler(log_like, prior_transform, d,
                         n_live=64, n_batch=12, mesh=chain_mesh())
    s = bp.NestedSampler(log_like, prior_transform, d, n_live=64,
                         n_batch=16)
    with pytest.raises(RuntimeError, match="run"):
        _ = s.samples


def test_max_batches_warns():
    d = 2
    s = bp.NestedSampler(gauss_loglike(d), prior_transform, d,
                         n_live=128, n_batch=16, n_mcmc=4,
                         max_batches=3, seed=9)
    with pytest.warns(UserWarning, match="max_batches"):
        info = s.run()
    assert not info["terminated"]
    assert info["n_batches"] == 3
