#!/usr/bin/env python
"""A/B: archive row-gather lowering (ROUND3 §14, `fused_gather` /
`gather_kernel`).

Three measurements, all at the headline 256-chain d=100 mixture:

1. Raw gather micro: ``buf[idx]`` (XLA) vs ``gather_rows_pallas``
   (rows_per_cell ∈ {8, 32, 128}) at archive capacities 8192 and 65536
   — is the XLA lowering capacity-proportional, and what row batch does
   the DMA kernel want?
2. Fused engine: ``make_chunk_runner(gather_mode=...)`` ∈ {block,
   pergen, kernel} at both capacities — the until-loop regression that
   motivated the kernel.
3. Per-generation engine: ``DreamConfig(gather_kernel=...)`` at both
   capacities — it pays the gather every generation, 10× more often.

Writes benchmarks/gather_mode_ab.json and prints markdown tables.
"""

import json
import os
import signal
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bipymc_tpu.models.targets import (gaussian_mixture,
                                       baseline_config3_means,
                                       stratified_mode_init)
from bipymc_tpu.samplers import dream
from bipymc_tpu.samplers.dream_fused import make_chunk_runner
from bipymc_tpu.ops.gather_rows import gather_rows_pallas
from bipymc_tpu.core.scan import run_scan

HERE = os.path.dirname(os.path.abspath(__file__))
D = 100
N_CHAINS = 256
GENS = 2500
CHUNKS = 4
N_ROWS = 6            # 2·delta_max rows per chain per generation


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def setup(capacity, seed=0):
    means = baseline_config3_means(D)
    lp = gaussian_mixture(means, sigma=1.0)
    cfg = dream.DreamConfig(n_chains=N_CHAINS, burnin_gens=0)
    key = jax.random.key(seed)
    k_x, k_z, k_run = jax.random.split(key, 3)
    x0 = stratified_mode_init(k_x, means, N_CHAINS, var=4.0)
    z0 = stratified_mode_init(k_z, means, N_CHAINS, var=4.0)
    state = dream.init(x0, lp, cfg, archive_capacity=capacity, z0=z0)
    return lp, cfg, state, k_run


def time_async(runner_call, state, k_run, n_chunks=CHUNKS):
    t0 = time.time()
    h = None
    for c in range(n_chunks):
        state, h = runner_call(state, jax.random.fold_in(k_run, 10 + c),
                               jnp.int32(GENS * (1 + c)))
    jax.block_until_ready(h)
    return (time.time() - t0) / (n_chunks * GENS), state


def micro(best_of=5):
    """Raw gather: one chunk's worth of rows ([10, 256, 6] indices)."""
    rows = {}
    key = jax.random.key(7)
    idx_shape = (10, N_CHAINS, N_ROWS)
    reps = 200           # gathers per timed dispatch (scan-chained)
    for cap in (8192, 65536):
        buf = jax.random.normal(jax.random.fold_in(key, cap), (cap, D))
        idx = jax.random.randint(jax.random.fold_in(key, cap + 1),
                                 idx_shape, 0, cap, jnp.int32)

        def chain(g):
            # data-dependent index chain defeats CSE across reps
            def body(c, _):
                out = g(buf, jnp.bitwise_xor(idx, c))
                c_new = jnp.asarray(
                    out[0, 0, 0, 0], jnp.int32) & jnp.asarray(0, jnp.int32)
                return c_new, out
            c, outs = jax.lax.scan(
                body, jnp.asarray(0, jnp.int32), None, length=reps)
            return outs[-1]

        arms = {"xla": jax.jit(lambda: chain(lambda b, i: b[i]))}
        for g in (8, 32, 128):
            arms[f"pallas_g{g}"] = jax.jit(
                lambda _g=g: chain(lambda b, i: gather_rows_pallas(
                    b, i, rows_per_cell=_g)))
        res = {}
        for name, fn in arms.items():
            jax.block_until_ready(fn())
            best = np.inf
            for _ in range(best_of):
                t0 = time.time()
                jax.block_until_ready(fn())
                best = min(best, (time.time() - t0) / reps)
            res[name] = best * 1e6
            log(f"  cap={cap} {name}: {best*1e6:.2f} us/gather")
        rows[str(cap)] = res
    return rows


def fused_arms(capacity, best_of=3):
    lp, cfg, state0, k_run = setup(capacity)
    jits, warm = {}, {}
    for mode in ("block", "pergen", "kernel"):
        runner = make_chunk_runner(lp, cfg, collect="stats",
                                   gather_mode=mode)

        def run(state, key, t0_, _r=runner):
            st, hist = _r(state, key, GENS, t0_)
            return st, hist["logp"]

        jits[mode] = jax.jit(run)
        t0 = time.time()
        warm[mode], _ = jax.block_until_ready(
            jits[mode](state0, jax.random.fold_in(k_run, 0), jnp.int32(0)))
        log(f"  fused cap={capacity} {mode}: compile+warm "
            f"{time.time()-t0:.1f}s")
    res = {}
    best = {m: np.inf for m in jits}
    for r in range(best_of):
        for m in jits:
            per_gen, warm[m] = time_async(jits[m], warm[m],
                                          jax.random.fold_in(k_run, r))
            log(f"  fused cap={capacity} {m} rep {r}: "
                f"{per_gen*1e6:.2f} us/gen")
            best[m] = min(best[m], per_gen)
    for m in best:
        res[m] = best[m] * 1e6
    return res


def pergen_arms(capacity, best_of=3):
    res = {}
    jits, warm, k_runs = {}, {}, {}
    for gk in (False, True):
        lp, cfg, state0, k_run = setup(capacity)
        cfg = cfg._replace(gather_kernel=gk)
        step = dream.make_step(lp, cfg, axis_name=None)

        def run(state, key, t0_, _step=step):
            return run_scan(lambda s, k, t: _step(s, k, t0_ + t), state,
                            key, GENS, collect_fn=lambda s, i: i.logp)

        name = "kernel" if gk else "xla"
        jits[name] = jax.jit(run)
        t0 = time.time()
        warm[name], _ = jax.block_until_ready(
            jits[name](state0, jax.random.fold_in(k_run, 0), jnp.int32(0)))
        k_runs[name] = k_run
        log(f"  pergen cap={capacity} {name}: compile+warm "
            f"{time.time()-t0:.1f}s")
    best = {m: np.inf for m in jits}
    for r in range(best_of):
        for m in jits:
            per_gen, warm[m] = time_async(jits[m], warm[m],
                                          jax.random.fold_in(k_runs[m], r))
            log(f"  pergen cap={capacity} {m} rep {r}: "
                f"{per_gen*1e6:.2f} us/gen")
            best[m] = min(best[m], per_gen)
    for m in best:
        res[m] = best[m] * 1e6
    return res


def main():
    signal.signal(signal.SIGALRM,
                  lambda *a: (log("watchdog: hung — abort"), os._exit(3)))
    signal.alarm(120)
    log("backend:", jax.default_backend(), jax.devices())
    np.asarray(jnp.ones(()))

    out = {}
    signal.alarm(900)
    log("== raw gather micro ==")
    out["micro_us_per_gather"] = micro()
    for cap in (8192, 65536):
        signal.alarm(1800)
        log(f"== fused engine cap={cap} ==")
        out[f"fused_us_per_gen_cap{cap}"] = fused_arms(cap)
        with open(os.path.join(HERE, "gather_mode_ab.json"), "w") as f:
            json.dump(out, f, indent=1)
    for cap in (8192, 65536):
        signal.alarm(1800)
        log(f"== per-generation engine cap={cap} ==")
        out[f"pergen_us_per_gen_cap{cap}"] = pergen_arms(cap)
        with open(os.path.join(HERE, "gather_mode_ab.json"), "w") as f:
            json.dump(out, f, indent=1)
    signal.alarm(0)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
