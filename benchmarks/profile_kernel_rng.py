#!/usr/bin/env python
"""A/B: fused engine rng='stream' vs rng='kernel' (in-kernel TPU PRNG).

profile_fused_split.py measured the XLA-side chunk prep at 53% of the
fused per-generation cost at 256 chains and 71% at 1024 — dominated by
the 3d-word threefry block, its uniform/normal conversions, and the
streamed u_mask/u_e/eps operands. rng='kernel' generates those inside
the kernel from the hardware PRNG (same conversion maps, different bit
source — distributionally equivalent, not bit-identical; validated in
tests/test_fused_chunk.py + the TPU statistical smoke). One process,
interleaved best-of-3. Writes benchmarks/kernel_rng_ab.json.
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
MODES = ("stream", "kernel")


def measure(n_chains, best_of=3):
    lp, cfg, state0, k_run = setup(n_chains)
    full_hist = n_chains <= 256
    collect = "all" if full_hist else "stats"

    jits, warm = {}, {}
    for m in MODES:
        runner = make_chunk_runner(lp, cfg, collect=collect, rng=m)

        def run(state, key, t0_, _r=runner):
            st, hist = _r(state, key, GENS, t0_)
            return st, hist["x" if full_hist else "logp"]

        jits[m] = jax.jit(run)
        t0 = time.time()
        st, _ = jax.block_until_ready(
            jits[m](state0, jax.random.fold_in(k_run, 0), jnp.int32(0)))
        warm[m] = st
        log(f"  rng={m}: compile+warm {time.time()-t0:.1f}s")

    best = {m: np.inf for m in MODES}
    for r in range(best_of):
        for m in MODES:
            per_gen, warm[m] = time_async(
                jits[m], warm[m], jax.random.fold_in(k_run, r))
            log(f"  rng={m} rep {r}: {per_gen*1e6:.2f} us/gen")
            best[m] = min(best[m], per_gen)
    return {"n_chains": n_chains, "gens_per_dispatch": GENS,
            "best_of": best_of,
            "stream_us_per_gen": best["stream"] * 1e6,
            "kernel_us_per_gen": best["kernel"] * 1e6,
            "speedup": best["stream"] / best["kernel"]}


def main():
    signal.signal(signal.SIGALRM,
                  lambda *a: (log("watchdog: hung — abort"), os._exit(3)))
    signal.alarm(120)
    log("backend:", jax.default_backend(), jax.devices())
    np.asarray(jnp.ones(()))

    rows = []
    for n_chains in (256, 1024, 4096):
        signal.alarm(1200)
        log(f"n_chains={n_chains}")
        r = measure(n_chains)
        rows.append(r)
        log(json.dumps(r))
        with open(os.path.join(HERE, "kernel_rng_ab.json"), "w") as f:
            json.dump(rows, f, indent=1)
    signal.alarm(0)

    print("| chains | stream µs/gen | kernel-rng µs/gen | speedup |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['n_chains']} | {r['stream_us_per_gen']:.1f} | "
              f"{r['kernel_us_per_gen']:.1f} | {r['speedup']:.2f}× |")


if __name__ == "__main__":
    main()
