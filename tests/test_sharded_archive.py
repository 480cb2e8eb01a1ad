"""Block-sharded archive Z (SURVEY.md §7.7 long-history scaling axis).

The ppermute ring gather and the local-block append must reproduce the
replicated archive exactly, and a DREAM-zs run with ``shard_archive=True``
must be bit-identical to the single-device vmap path (the sharded layout
changes where rows live, not which rows are drawn).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from bipymc_tpu import DreamZs
from bipymc_tpu.ensemble.archive import (
    archive_append, archive_append_sharded, archive_gather_sharded,
    archive_init)
from bipymc_tpu.models.targets import correlated_gaussian
from bipymc_tpu.parallel.mesh import CHAIN_AXIS, chain_mesh

needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multiple (fake) devices")

MEAN = jnp.array([1.0, -1.0])
COV = jnp.array([[1.0, 0.8], [0.8, 1.5]])


@needs_devices
def test_ring_gather_matches_direct_gather():
    mesh = chain_mesh()
    cap, d = 64, 5
    key = jax.random.key(0)
    buf = jax.random.normal(key, (cap, d))
    idx = jax.random.randint(jax.random.key(1), (16, 3), 0, cap,
                             dtype=jnp.int32)

    gathered = jax.jit(jax.shard_map(
        lambda b, i: archive_gather_sharded(b, i, CHAIN_AXIS),
        mesh=mesh, in_specs=(P(CHAIN_AXIS, None), P(None, None)),
        out_specs=P(None, None, None), check_vma=False))(buf, idx)
    np.testing.assert_array_equal(np.asarray(gathered), np.asarray(buf[idx]))


@needs_devices
def test_sharded_append_matches_replicated():
    mesh = chain_mesh()
    cap, d, k = 64, 3, 10
    z0 = jax.random.normal(jax.random.key(2), (7, d))
    batches = jax.random.normal(jax.random.key(3), (9, k, d))

    ref = archive_init(z0, cap)
    for b in batches:                      # wraps the ring twice
        ref = archive_append(ref, b)

    def run(buf, fill, head, batches):
        from bipymc_tpu.ensemble.archive import Archive
        ar = Archive(buf=buf, fill=fill, head=head)
        for b in batches:
            ar = archive_append_sharded(ar, b, CHAIN_AXIS)
        return ar.buf, ar.fill, ar.head

    init = archive_init(z0, cap)
    buf, fill, head = jax.jit(jax.shard_map(
        run, mesh=mesh,
        in_specs=(P(CHAIN_AXIS, None), P(), P(), P(None, None, None)),
        out_specs=(P(CHAIN_AXIS, None), P(), P()), check_vma=False))(
            init.buf, init.fill, init.head, batches)
    np.testing.assert_array_equal(np.asarray(buf), np.asarray(ref.buf))
    assert int(fill) == int(ref.fill)
    assert int(head) == int(ref.head)


@needs_devices
def test_dream_sharded_archive_equals_vmap():
    """shard_archive changes the layout, not the trajectories."""
    lp = correlated_gaussian(MEAN, COV)
    a = DreamZs(lp, n_chains=16, seed=9, mesh=chain_mesh(),
                shard_archive=True, archive_capacity=256,
                archive_thin=3).run_mcmc(150, MEAN, spread=2.0)
    b = DreamZs(lp, n_chains=16, seed=9,
                archive_capacity=256, archive_thin=3).run_mcmc(
                    150, MEAN, spread=2.0)
    np.testing.assert_array_equal(a.super_chain, b.super_chain)
    np.testing.assert_array_equal(a.acceptance_fraction,
                                  b.acceptance_fraction)


@needs_devices
def test_sharded_archive_run_until():
    """R̂ early stop composes with the sharded archive (while_loop of
    scan chunks with the ppermute ring inside)."""
    lp = correlated_gaussian(MEAN, COV)
    s = DreamZs(lp, n_chains=16, seed=3, mesh=chain_mesh(),
                shard_archive=True, archive_capacity=512)
    info = s.run_mcmc_until(MEAN, rhat_tol=1.1, chunk=100, max_chunks=60,
                            spread=2.0)
    assert float(info["rhat"].max()) < 1.1
    assert np.abs(info["mean"].mean(0) - np.asarray(MEAN)).max() < 0.5


@needs_devices
def test_explicit_capacity_indivisible_raises():
    """A user-specified capacity is never silently rounded (that would
    break bit-identity with the replicated run once the ring wraps)."""
    lp = correlated_gaussian(MEAN, COV)
    with pytest.raises(ValueError, match="archive_capacity"):
        DreamZs(lp, n_chains=16, seed=0, mesh=chain_mesh(),
                shard_archive=True, archive_capacity=1001).run_mcmc(
                    10, MEAN)


def test_shard_archive_requires_archive():
    from bipymc_tpu.samplers import dream
    cfg = dream.dream_config(n_chains=16, shard_archive=True)
    with pytest.raises(ValueError, match="use_archive"):
        dream.make_step(lambda x: -jnp.sum(x ** 2), cfg, axis_name=None)
