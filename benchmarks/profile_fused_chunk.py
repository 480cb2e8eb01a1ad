#!/usr/bin/env python
"""A/B: fused multi-generation engine vs per-generation engine (round 3).

Headline-config shapes (BASELINE config 3: 256 chains × d=100, 4-mode
mixture, archive 8192) plus chain-scaling points. One process, variants
interleaved best-of-N (axon tunnel drifts ±35% across sessions —
docs/design.md §10b); per-call floor amortised by timing n_gens ≥ 2500
per dispatch with async chunk dispatch (bench.py style).

Writes benchmarks/fused_ab.json and prints a markdown table.
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

from bipymc_tpu.models.targets import gaussian_mixture, stratified_mode_init
from bipymc_tpu.samplers import dream
from bipymc_tpu.samplers.dream_fused import make_chunk_runner
from bipymc_tpu.core.scan import run_scan

HERE = os.path.dirname(os.path.abspath(__file__))
D = 100
GENS = 2500          # per timed dispatch
CHUNKS = 4           # async-dispatched timed chunks


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def setup(n_chains, seed=0):
    from bipymc_tpu.models.targets import baseline_config3_means
    means = baseline_config3_means(D)
    lp = gaussian_mixture(means, sigma=1.0)
    cfg = dream.DreamConfig(n_chains=n_chains, burnin_gens=0)
    key = jax.random.key(seed)
    k_x, k_z, k_run = jax.random.split(key, 3)
    x0 = stratified_mode_init(k_x, means, n_chains, var=4.0)
    z0 = stratified_mode_init(k_z, means, n_chains, var=4.0)
    state = dream.init(x0, lp, cfg, archive_capacity=8192, z0=z0)
    return lp, cfg, state, k_run


def time_async(runner_call, state, k_run, n_chunks=CHUNKS):
    """Dispatch n_chunks timed runs without blocking between them."""
    t0 = time.time()
    for c in range(n_chunks):
        state, h = runner_call(state, jax.random.fold_in(k_run, 10 + c),
                               jnp.int32(GENS * (1 + c)))
    jax.block_until_ready(h)
    return (time.time() - t0) / (n_chunks * GENS), state


def measure(n_chains, best_of=3):
    lp, cfg, state0, k_run = setup(n_chains)

    # position history costs GENS·n·d floats per dispatch (1 GB at 1024
    # chains) and CHUNKS of them are live under async dispatch — collect
    # logp-only above the headline chain count, identically on BOTH sides
    full_hist = n_chains <= 256
    step = dream.make_step(lp, cfg, axis_name=None)
    coll = ((lambda s, info: s.x) if full_hist
            else (lambda s, info: info.logp))

    def default_run(state, key, t0_):
        return run_scan(lambda s, k, t: step(s, k, t0_ + t), state, key,
                        GENS, collect_fn=coll)

    fused = make_chunk_runner(lp, cfg,
                              collect="all" if full_hist else "stats")

    def fused_run(state, key, t0_):
        st, hist = fused(state, key, GENS, t0_)
        return st, hist["x" if full_hist else "logp"]

    jd = jax.jit(default_run)
    jf = jax.jit(fused_run)

    # compile + warm both (also burns in the archive ring)
    t0 = time.time()
    sd, _ = jax.block_until_ready(jd(state0, jax.random.fold_in(k_run, 0),
                                     jnp.int32(0)))
    log(f"  default compile+warm {time.time()-t0:.1f}s")
    t0 = time.time()
    sf, _ = jax.block_until_ready(jf(state0, jax.random.fold_in(k_run, 0),
                                     jnp.int32(0)))
    log(f"  fused   compile+warm {time.time()-t0:.1f}s")

    res = {"n_chains": n_chains, "gens_per_dispatch": GENS,
           "timed_chunks": CHUNKS, "best_of": best_of}
    for name, fn, st in (("default", jd, sd), ("fused", jf, sf)):
        best = np.inf
        for r in range(best_of):
            per_gen, st = time_async(fn, st, jax.random.fold_in(k_run, r))
            log(f"  {name} rep {r}: {per_gen*1e6:.2f} us/gen")
            best = min(best, per_gen)
        res[name + "_us_per_gen"] = best * 1e6
    res["speedup"] = res["default_us_per_gen"] / res["fused_us_per_gen"]
    return res


def main():
    signal.signal(signal.SIGALRM,
                  lambda *a: (log("watchdog: hung — abort"), os._exit(3)))
    signal.alarm(120)        # the tunnel can hang the first device call
    log("backend:", jax.default_backend(), jax.devices())
    np.asarray(jnp.ones(()))

    rows = []
    for n_chains in (256, 1024, 4096):
        signal.alarm(900)
        log(f"n_chains={n_chains}")
        r = measure(n_chains)
        rows.append(r)
        log(json.dumps(r))
        with open(os.path.join(HERE, "fused_ab.json"), "w") as f:
            json.dump(rows, f, indent=1)
    signal.alarm(0)

    print("| chains | default µs/gen | fused µs/gen | speedup |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['n_chains']} | {r['default_us_per_gen']:.1f} | "
              f"{r['fused_us_per_gen']:.1f} | {r['speedup']:.2f}× |")


if __name__ == "__main__":
    main()
