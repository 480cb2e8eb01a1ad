"""Hardware-only regression tests (real TPU chip; skipped on CPU).

Run with the conftest escape hatch:

    BIPYMC_TPU_TESTS=1 python -m pytest tests/test_tpu_hardware.py -q

Round 3 found four bugs the CPU/interpret suite was structurally blind
to — Mosaic has no ``expm1`` lowering (the DR acceptance could not
compile), vmap's batched vector-vector ``dot_general`` from
``(r@inv)@r`` fails Mosaic attribute parsing, HBM row slices must be
128-lane aligned (the d=100 gather), and the f32 Cholesky cliff that
only the TPU's compiled-scan rounding fell off (docs/ROUND3.md §§10,
14, 17). Each test here drives the real Mosaic lowering of one such
path end-to-end at small shapes (seconds each, not benchmarks).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="hardware-only: run with BIPYMC_TPU_TESTS=1 on a TPU host")

from bipymc_tpu.models.targets import correlated_gaussian  # noqa: E402

MEAN = np.array([0.5, -0.5])
COV = np.array([[1.0, 0.3], [0.3, 0.5]])


def test_fused_rw_dram_matches_per_step_on_hardware():
    """The fused RW kernel (Mosaic path: in-kernel target eval + exact
    Green–Mira acceptance via the shared log1mexp) against the per-step
    engine — accept decisions identical, positions to re-association."""
    from bipymc_tpu.samplers import rw
    from bipymc_tpu.samplers.rw_fused import make_rw_chunk_runner
    from bipymc_tpu.core.scan import run_scan

    lp = correlated_gaussian(MEAN, COV)
    cfg = rw.dram_config(adapt_interval=50)
    n_chains, n_steps = 4, 200
    key = jax.random.key(3)
    theta0 = 0.5 * jax.random.normal(key, (n_chains, 2))
    state = jax.vmap(lambda t: rw.init(t, lp, jnp.eye(2) * 0.5))(theta0)
    step = rw.make_step(lp, cfg)
    cids = jnp.arange(n_chains)

    def batched(s, k, t):
        ks = jax.vmap(lambda i: jax.random.fold_in(k, i))(cids)
        return jax.vmap(step, in_axes=(0, 0, None))(s, ks, t)

    k_run = jax.random.key(7)
    _, ref = jax.jit(lambda s: run_scan(
        batched, s, k_run, n_steps,
        collect_fn=lambda st, i: {"x": st.theta, "acc": i.accepted}))(state)
    fused = make_rw_chunk_runner(lp, cfg, n_chains)
    _, hist = jax.jit(lambda s: fused(s, k_run, n_steps, 0))(state)
    np.testing.assert_array_equal(np.asarray(hist["accepted"]),
                                  np.asarray(ref["acc"]))
    np.testing.assert_allclose(np.asarray(hist["x"]), np.asarray(ref["x"]),
                               rtol=2e-4, atol=2e-5)


def test_fused_stretch_matches_per_gen_on_hardware():
    from bipymc_tpu.samplers import stretch
    from bipymc_tpu.samplers.stretch_fused import make_chunk_runner
    from bipymc_tpu.core.scan import run_scan

    d = 4
    lp = lambda th: -0.5 * jnp.sum(th * th)  # noqa: E731
    cfg = stretch.StretchConfig(n_chains=32)
    x0 = jax.random.normal(jax.random.key(0), (32, d))
    state = stretch.init(x0, lp)
    step = stretch.make_step(lp, cfg)
    k_run = jax.random.key(5)
    _, ref = jax.jit(lambda s: run_scan(
        step, s, k_run, 64,
        collect_fn=lambda st, i: {"x": st.x, "acc": i.accepted}))(state)
    fused = make_chunk_runner(lp, cfg)
    _, hist = jax.jit(lambda s: fused(s, k_run, 64, 0))(state)
    np.testing.assert_array_equal(np.asarray(hist["accepted"]),
                                  np.asarray(ref["acc"]))
    np.testing.assert_allclose(np.asarray(hist["x"]), np.asarray(ref["x"]),
                               rtol=2e-4, atol=2e-5)


def test_fused_dream_stream_matches_per_gen_on_hardware():
    """Stream-RNG fused DREAM chunk vs the per-generation engine, both
    on their real TPU kernels (Pallas proposal auto-on)."""
    from bipymc_tpu.samplers import dream
    from bipymc_tpu.samplers.dream_fused import make_chunk_runner
    from bipymc_tpu.core.scan import run_scan

    d = 4
    lp = lambda th: -0.5 * jnp.sum(th * th)  # noqa: E731
    cfg = dream.DreamConfig(n_chains=16, burnin_gens=0)
    key = jax.random.key(2)
    kx, kz, kr = jax.random.split(key, 3)
    x0 = jax.random.normal(kx, (16, d))
    z0 = jax.random.normal(kz, (32, d))
    state = dream.init(x0, lp, cfg, archive_capacity=64, z0=z0)
    step = dream.make_step(lp, cfg, axis_name=None)
    _, ref = jax.jit(lambda s: run_scan(
        step, s, kr, 40,
        collect_fn=lambda st, i: {"x": st.x, "acc": i.accepted}))(state)
    fused = make_chunk_runner(lp, cfg, rng="stream")
    _, hist = jax.jit(lambda s: fused(s, kr, 40, 0))(state)
    np.testing.assert_array_equal(np.asarray(hist["accepted"]),
                                  np.asarray(ref["acc"]))
    np.testing.assert_allclose(np.asarray(hist["x"]), np.asarray(ref["x"]),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("cap,d", [(8192, 100), (64, 5), (512, 128)])
def test_gather_rows_exact_on_hardware(cap, d):
    """HBM row-DMA gather vs fancy indexing, including the ragged-d
    lane-pad path (d=100/5) Mosaic rejected before round 3's fix."""
    from bipymc_tpu.ops.gather_rows import gather_rows_pallas
    buf = jax.random.normal(jax.random.key(cap), (cap, d))
    idx = jax.random.randint(jax.random.key(cap + 1), (7, 16, 3), 0, cap)
    got = np.asarray(gather_rows_pallas(buf, idx))
    np.testing.assert_array_equal(got, np.asarray(buf[idx]))


def test_gp_optimize_cliff_on_hardware():
    """The §17 scenario on the real chip: noiseless scores, n=256,
    σ_n → 0. The n-aware jitter floor + step rejection must keep the
    compiled Adam scan finite HERE, not just on CPU."""
    import test_gp
    test_gp.test_optimize_noiseless_scores_near_f32_cliff()


def test_gmm_diag_logq_precision_on_hardware():
    """The round-4 northstar bias, pinned (docs/ROUND4.md): the diag GMM
    log-q expansion cancels three O(‖μ‖²) matmul terms to O(d), so MXU
    default precision (bf16 truncation of inputs ~2500 ⇒ O(nats) of
    position-dependent log-q noise) silently biases mode exchange in
    every independence-MH ratio built on it. With Precision.HIGHEST the
    diag path must agree with the triangular-solve path ON THE CHIP to
    float-sum tolerance at headline-scale mode norms (d=100, ‖μ‖≈50).
    Before the fix this differed by up to ~5 nats here."""
    from bipymc_tpu.models.targets import baseline_config3_means
    from bipymc_tpu.utils.mixtures import (GmmParams, gmm_log_q,
                                           gmm_log_q_diag)
    d = 100
    means = jnp.asarray(baseline_config3_means(d))
    k = means.shape[0]
    sd = 1.0 + 0.1 * jax.random.normal(jax.random.key(0), (k, d))
    params = GmmParams(log_w=jnp.full((k,), -np.log(k)), mu=means,
                       chol=sd[:, :, None] * jnp.eye(d)[None])
    x = (means[jnp.arange(512) % k]
         + jax.random.normal(jax.random.key(1), (512, d)))
    got = np.asarray(jax.jit(lambda p, q: gmm_log_q_diag(p, q))(params, x))
    ref = np.asarray(jax.jit(lambda p, q: gmm_log_q(p, q))(params, x))
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-2)
