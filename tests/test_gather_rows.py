"""Capacity-independent archive row gather (ops/gather_rows.py).

A copy is a copy: the DMA kernel must return exactly ``buf[idx]`` for
every index shape the fused engine produces — including duplicate rows
(two chains may sample the same archive entry) and row counts that don't
divide the per-cell DMA group. Wiring: ``make_chunk_runner(
gather_mode="kernel")`` must be trajectory-identical to the default
"block" lowering (same values in, same values out — only the lowering
differs; docs/ROUND3.md §14).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bipymc_tpu.ops.gather_rows import gather_rows_pallas
from bipymc_tpu.samplers.dream_fused import make_chunk_runner

from test_fused_chunk import _setup, _collect  # noqa: F401


@pytest.mark.parametrize("shape", [(37,), (4, 9), (10, 16, 7)])
def test_gather_matches_fancy_index(shape):
    buf = jax.random.normal(jax.random.key(0), (512, 100), jnp.float32)
    idx = jax.random.randint(jax.random.key(1), shape, 0, 512)
    out = gather_rows_pallas(buf, idx, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(buf[idx]))


def test_gather_duplicate_rows_and_small_group():
    buf = jax.random.normal(jax.random.key(2), (64, 5), jnp.float32)
    idx = jnp.array([3, 3, 0, 63, 3, 0], jnp.int32)
    out = gather_rows_pallas(buf, idx, rows_per_cell=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(buf[idx]))


def test_fused_engine_gather_kernel_matches_block():
    log_prob, cfg, state, k_run = _setup()
    cfg = cfg._replace(pallas_proposal=True)
    run_block = make_chunk_runner(log_prob, cfg, gather_mode="block")
    run_kernel = make_chunk_runner(log_prob, cfg, gather_mode="kernel")
    st_b, hist_b = run_block(state, k_run, 20, 20)
    st_k, hist_k = run_kernel(state, k_run, 20, 20)
    np.testing.assert_array_equal(np.asarray(hist_b["accepted"]),
                                  np.asarray(hist_k["accepted"]))
    np.testing.assert_array_equal(np.asarray(hist_b["x"]),
                                  np.asarray(hist_k["x"]))
    np.testing.assert_array_equal(np.asarray(st_b.archive.buf),
                                  np.asarray(st_k.archive.buf))


def test_gather_empty_and_out_of_range():
    buf = jax.random.normal(jax.random.key(0), (64, 12), jnp.float32)
    # empty index set: same empty result as buf[idx]
    empty = jnp.zeros((0,), jnp.int32)
    out = gather_rows_pallas(buf, empty, interpret=True)
    assert out.shape == (0, 12)
    # out-of-range rows clamp (XLA gather semantics) instead of DMAing
    # past the buffer
    idx = jnp.array([0, 63, 64, 1000], jnp.int32)
    out = gather_rows_pallas(buf, idx, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(buf[jnp.clip(idx, 0, 63)]))


def test_gather_mode_validated():
    log_prob, cfg, state, k_run = _setup()
    with pytest.raises(ValueError, match="gather_mode"):
        make_chunk_runner(log_prob, cfg, gather_mode="onehot")
    with pytest.raises(ValueError, match="collect"):
        make_chunk_runner(log_prob, cfg, collect="rhats")


def test_pergen_engine_gather_kernel_matches_default():
    import bipymc_tpu as bp

    def run(**kw):
        s = bp.DreamZs(lambda x: -0.5 * jnp.sum(x ** 2), n_chains=8,
                       seed=11, burnin_gens=10, archive_thin=5,
                       archive_capacity=64, **kw)
        s.run_mcmc(30, theta_0=np.zeros(4, np.float32), spread=2.0)
        return s.chain

    np.testing.assert_array_equal(run(), run(gather_kernel=True))


def test_api_fused_gather_kernel_matches_block():
    import bipymc_tpu as bp

    def run(mode):
        s = bp.DreamZs(lambda x: -0.5 * jnp.sum(x ** 2), n_chains=8,
                       seed=3, fused=True, fused_gather=mode,
                       burnin_gens=10, archive_thin=5,
                       archive_capacity=64)
        s.run_mcmc(40, theta_0=np.zeros(4, np.float32), spread=2.0)
        return s.chain

    np.testing.assert_array_equal(run("block"), run("kernel"))
    with pytest.raises(ValueError, match="fused_gather"):
        bp.DreamZs(lambda x: x, fused_gather="onehot")


def test_gather_knob_misuse_raises():
    import bipymc_tpu as bp
    from bipymc_tpu.samplers import dream
    lp = lambda v: -0.5 * jnp.sum(v ** 2)   # noqa: E731
    # fused_gather is a fused-engine knob
    with pytest.raises(ValueError, match="fused=True"):
        bp.DreamZs(lp, n_chains=8, fused_gather="kernel")
    # gather_kernel needs an archive to gather from
    with pytest.raises(ValueError, match="use_archive"):
        bp.Dream(lp, n_chains=16, gather_kernel=True).run_mcmc(
            4, theta_0=np.zeros(3, np.float32), spread=1.0)
    # ...and a replicated one (the sharded path has its own ring gather)
    cfg = dream.DreamConfig(n_chains=8, shard_archive=True,
                            gather_kernel=True)
    with pytest.raises(ValueError, match="replicated"):
        dream.make_step(lp, cfg, axis_name="chains")
