#!/usr/bin/env python
"""A/B: fused-engine prep batching (design.md §10e's last lever).

Sweeps ``make_chunk_runner(prep_chunks=...)`` at headline shapes.
prep_chunks=1 is the pre-batching behaviour (every chunk regenerates its
own randomness, ~15 launches per archive_thin generations); larger
values regroup the archive-independent prep into superchunks, leaving
only distinct-idx + gather + kernel + append per chunk. Trajectories are
bit-identical across the sweep (tests/test_fused_chunk.py::
test_prep_chunks_invariance), so this measures launch overhead only.

One process, variants interleaved best-of-N (tunnel drift — design.md
§10b), per-call floor amortised over GENS-generation dispatches with
async chunk dispatch. Writes benchmarks/prep_batch_ab.json.
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
from benchmarks.profile_fused_chunk import setup, time_async, GENS, log

HERE = os.path.dirname(os.path.abspath(__file__))
SWEEP = (1, 4, 8, 16, 32)


def measure(n_chains, best_of=3):
    lp, cfg, state0, k_run = setup(n_chains)
    full_hist = n_chains <= 256
    collect = "all" if full_hist else "stats"

    jits, warm_states = {}, {}
    for m in SWEEP:
        runner = make_chunk_runner(lp, cfg, collect=collect, prep_chunks=m)

        def run(state, key, t0_, _runner=runner):
            st, hist = _runner(state, key, GENS, t0_)
            return st, hist["x" if full_hist else "logp"]

        jits[m] = jax.jit(run)
        t0 = time.time()
        st, _ = jax.block_until_ready(
            jits[m](state0, jax.random.fold_in(k_run, 0), jnp.int32(0)))
        warm_states[m] = st
        log(f"  prep_chunks={m}: compile+warm {time.time()-t0:.1f}s")

    res = {"n_chains": n_chains, "gens_per_dispatch": GENS,
           "best_of": best_of, "us_per_gen": {}}
    best = {m: np.inf for m in SWEEP}
    for r in range(best_of):
        for m in SWEEP:                       # interleaved across variants
            per_gen, warm_states[m] = time_async(
                jits[m], warm_states[m], jax.random.fold_in(k_run, r))
            log(f"  prep_chunks={m} rep {r}: {per_gen*1e6:.2f} us/gen")
            best[m] = min(best[m], per_gen)
    res["us_per_gen"] = {str(m): best[m] * 1e6 for m in SWEEP}
    res["speedup_vs_unbatched"] = best[1] / min(best.values())
    res["best_prep_chunks"] = min(best, key=best.get)
    return res


def main():
    signal.signal(signal.SIGALRM,
                  lambda *a: (log("watchdog: hung — abort"), os._exit(3)))
    signal.alarm(120)
    log("backend:", jax.default_backend(), jax.devices())
    np.asarray(jnp.ones(()))

    rows = []
    for n_chains in (256, 1024, 4096):
        signal.alarm(1800)
        log(f"n_chains={n_chains}")
        r = measure(n_chains)
        rows.append(r)
        log(json.dumps(r))
        with open(os.path.join(HERE, "prep_batch_ab.json"), "w") as f:
            json.dump(rows, f, indent=1)
    signal.alarm(0)

    hdr = " | ".join(f"M={m}" for m in SWEEP)
    print(f"| chains | {hdr} | best |")
    print("|---" * (len(SWEEP) + 2) + "|")
    for r in rows:
        cells = " | ".join(f"{r['us_per_gen'][str(m)]:.1f}" for m in SWEEP)
        print(f"| {r['n_chains']} | {cells} | M={r['best_prep_chunks']} "
              f"({r['speedup_vs_unbatched']:.2f}× vs M=1) |")


if __name__ == "__main__":
    main()
