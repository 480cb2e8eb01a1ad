#!/usr/bin/env python
"""A/B: batched Z-publication interval (ROUND3 §12, `z_update_every`).

Sweeps ``make_chunk_runner(z_update_every=K)`` on the headline engine
configuration (rng="kernel", prep batching on) at the headline shapes.
K·archive_thin generations run as ONE kernel with one distinct-row
draw / Z gather / batched append per super-block; K=1 is the exact
per-thin-block engine. Trajectories for K>1 sample a Z stale by up to
K·thin gens (documented execution knob — NOT bit-identical), so this
sweep measures the speed side of that trade.

One process, variants interleaved best-of-N; per-call floor amortised
over GENS-generation dispatches with async chunk dispatch. Writes
benchmarks/zupdate_ab.json.
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

from bipymc_tpu.samplers.dream_fused import make_chunk_runner
from benchmarks.profile_fused_chunk import setup, log

HERE = os.path.dirname(os.path.abspath(__file__))
GENS = 2560          # multiple of every CG = 10·K below
CHUNKS = 4


def time_async(runner_call, state, k_run, n_chunks=CHUNKS):
    t0 = time.time()
    h = None
    for c in range(n_chunks):
        state, h = runner_call(state, jax.random.fold_in(k_run, 10 + c),
                               jnp.int32(GENS * (1 + c)))
    jax.block_until_ready(h)
    return (time.time() - t0) / (n_chunks * GENS), state


def measure(n_chains, sweep, rng="kernel", best_of=3):
    lp, cfg, state0, k_run = setup(n_chains)
    full_hist = n_chains <= 256
    collect = "all" if full_hist else "stats"

    jits, warm_states = {}, {}
    for K in sweep:
        runner = make_chunk_runner(lp, cfg, collect=collect, rng=rng,
                                   z_update_every=K)

        def run(state, key, t0_, _runner=runner):
            st, hist = _runner(state, key, GENS, t0_)
            return st, hist["x" if full_hist else "logp"]

        jits[K] = jax.jit(run)
        t0 = time.time()
        st, _ = jax.block_until_ready(
            jits[K](state0, jax.random.fold_in(k_run, 0), jnp.int32(0)))
        warm_states[K] = st
        log(f"  K={K}: compile+warm {time.time()-t0:.1f}s")

    res = {"n_chains": n_chains, "rng": rng, "gens_per_dispatch": GENS,
           "best_of": best_of, "us_per_gen": {}}
    best = {K: np.inf for K in sweep}
    for r in range(best_of):
        for K in sweep:
            per_gen, warm_states[K] = time_async(
                jits[K], warm_states[K], jax.random.fold_in(k_run, r))
            log(f"  K={K} rep {r}: {per_gen*1e6:.2f} us/gen")
            best[K] = min(best[K], per_gen)
    res["us_per_gen"] = {str(K): best[K] * 1e6 for K in sweep}
    res["speedup_vs_K1"] = best[sweep[0]] / min(best.values())
    res["best_K"] = min(best, key=best.get)
    return res


def main():
    signal.signal(signal.SIGALRM,
                  lambda *a: (log("watchdog: hung — abort"), os._exit(3)))
    signal.alarm(120)
    log("backend:", jax.default_backend(), jax.devices())
    np.asarray(jnp.ones(()))

    rows = []
    for n_chains, sweep in ((256, (1, 2, 4, 8, 16)), (1024, (1, 8))):
        signal.alarm(1800)
        log(f"n_chains={n_chains}")
        r = measure(n_chains, sweep)
        rows.append(r)
        log(json.dumps(r))
        with open(os.path.join(HERE, "zupdate_ab.json"), "w") as f:
            json.dump(rows, f, indent=1)
    signal.alarm(0)

    for r in rows:
        ks = sorted(r["us_per_gen"], key=int)
        hdr = " | ".join(f"K={k}" for k in ks)
        print(f"| chains | {hdr} | best |")
        print("|---" * (len(ks) + 2) + "|")
        cells = " | ".join(f"{r['us_per_gen'][k]:.1f}" for k in ks)
        print(f"| {r['n_chains']} | {cells} | K={r['best_K']} "
              f"({r['speedup_vs_K1']:.2f}× vs K=1) |")


if __name__ == "__main__":
    main()
