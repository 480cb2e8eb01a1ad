#!/usr/bin/env python
"""Reconcile the config-3 throughput story: raw-scan vs API path, one session.

Round-1 artifacts disagreed by ~8x (bench.py raw scan: 18,100 gens/s;
run_all.py via DreamZs.run_mcmc: 2,110 gens/s). Both paths are one jitted
scan over the same step, so they should be within a few percent — this
script times them back-to-back on the same backend in the same process to
separate real API overhead from tunnel-condition drift.
"""

import json
import os
import sys
import time

import numpy as np

D = 100
N_CHAINS = 256
GENS = 2500
SEED = 0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import bipymc_tpu as bp
    from bipymc_tpu.models.targets import gaussian_mixture
    from bipymc_tpu.samplers import dream
    from bipymc_tpu.core.scan import run_scan
    from bipymc_tpu.utils.init import var_ball

    log("devices:", jax.devices())
    t0 = time.time()
    np.asarray(jnp.ones(()))
    log(f"tunnel warmup: {time.time() - t0:.1f}s")

    rng = np.random.default_rng(1234)
    means = 5.0 * rng.standard_normal((4, D)).astype(np.float32)
    log_prob = gaussian_mixture(means, sigma=1.0)

    # --- raw scan path (bench.py semantics) -----------------------------
    cfg = dream.DreamConfig(n_chains=N_CHAINS, burnin_gens=500)
    key = jax.random.key(SEED)
    k_x, k_z, k_run = jax.random.split(key, 3)
    var = jnp.full((D,), 4.0, dtype=jnp.float32)
    x0 = var_ball(k_x, var, N_CHAINS, dtype=jnp.float32)
    z0 = var_ball(k_z, var, N_CHAINS, dtype=jnp.float32)
    state = dream.init(x0, log_prob, cfg, archive_capacity=8192, z0=z0)
    step = dream.make_step(log_prob, cfg, axis_name=None)

    def chunk_run(state, key, t0_):
        return run_scan(lambda s, k, t: step(s, k, t0_ + t), state, key,
                        GENS, collect_fn=lambda s, info: s.x)

    runner = jax.jit(chunk_run)
    t0 = time.time()
    state, _ = jax.block_until_ready(
        runner(state, jax.random.fold_in(k_run, 0), jnp.int32(0)))
    log(f"raw: compile + burn-in chunk: {time.time() - t0:.1f}s")
    t0 = time.time()
    state, h = runner(state, jax.random.fold_in(k_run, 1), jnp.int32(GENS))
    jax.block_until_ready(h)
    raw_elapsed = time.time() - t0
    log(f"raw scan: {GENS} gens in {raw_elapsed:.3f}s "
        f"= {GENS / raw_elapsed:,.0f} gens/s")

    # --- API path (run_all.py semantics) --------------------------------
    s2 = bp.DreamZs(log_prob, n_chains=N_CHAINS, seed=1, burnin_gens=500,
                    archive_capacity=8192)
    t0 = time.time()
    s2.run_mcmc(GENS, jnp.zeros(D), spread=2.0)       # compile + burn-in
    log(f"api: compile + burn-in run: {time.time() - t0:.1f}s")
    t0 = time.time()
    s2.run_mcmc(GENS)                                 # continuation (timed)
    api_elapsed = time.time() - t0
    log(f"api path: {GENS} gens in {api_elapsed:.3f}s "
        f"= {GENS / api_elapsed:,.0f} gens/s")

    # repeat both once more to expose drift within the session
    t0 = time.time()
    state, h = runner(state, jax.random.fold_in(k_run, 2),
                      jnp.int32(2 * GENS))
    jax.block_until_ready(h)
    raw2 = time.time() - t0
    t0 = time.time()
    s2.run_mcmc(GENS)
    api2 = time.time() - t0
    log(f"second pass: raw {GENS / raw2:,.0f} gens/s, "
        f"api {GENS / api2:,.0f} gens/s")

    out = {
        "raw_gens_per_sec": round(GENS / raw_elapsed, 1),
        "api_gens_per_sec": round(GENS / api_elapsed, 1),
        "raw2_gens_per_sec": round(GENS / raw2, 1),
        "api2_gens_per_sec": round(GENS / api2, 1),
        "api_over_raw": round(raw_elapsed / api_elapsed, 3),
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
