#!/usr/bin/env python
"""A/B: fused stretch ensemble engine vs per-generation engine (ROUND3 §13).

32 and 256 walkers at d=16 on an anisotropic Gaussian — the
emcee-shaped workload (small population, cheap target) where dispatch
overhead dominates the per-generation engine. One process, arms
interleaved best-of-N; per-call floor amortised over GENS-generation
dispatches with async chunk dispatch.

Writes benchmarks/stretch_fused_ab.json and prints a markdown table.
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

from bipymc_tpu.samplers import stretch
from bipymc_tpu.samplers.stretch_fused import make_chunk_runner
from bipymc_tpu.core.scan import run_scan

HERE = os.path.dirname(os.path.abspath(__file__))
D = 16
GENS = 20000
CHUNKS = 4


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def setup(n_walkers, seed=0):
    scales = np.linspace(0.5, 3.0, D).astype(np.float32)
    inv_var = 1.0 / scales ** 2

    def lp(theta):
        return -0.5 * jnp.sum(theta * theta * inv_var)

    cfg = stretch.StretchConfig(n_chains=n_walkers)
    key = jax.random.key(seed)
    k_x, k_run = jax.random.split(key)
    x0 = jax.random.normal(k_x, (n_walkers, D)) * scales
    state = stretch.init(x0, lp)
    return lp, cfg, state, k_run


def time_async(runner_call, state, k_run, n_chunks=CHUNKS):
    t0 = time.time()
    h = None
    for c in range(n_chunks):
        state, h = runner_call(state, jax.random.fold_in(k_run, 10 + c),
                               jnp.int32(GENS * (1 + c)))
    jax.block_until_ready(h)
    return (time.time() - t0) / (n_chunks * GENS), state


def measure(n_walkers, best_of=3):
    lp, cfg, state0, k_run = setup(n_walkers)
    step = stretch.make_step(lp, cfg)

    def default_run(state, key, t0_):
        return run_scan(lambda s, k, t: step(s, k, t0_ + t), state, key,
                        GENS, collect_fn=lambda s, info: s.x)

    fused = make_chunk_runner(lp, cfg)

    def fused_run(state, key, t0_):
        st, hist = fused(state, key, GENS, t0_)
        return st, hist["x"]

    jd = jax.jit(default_run)
    jf = jax.jit(fused_run)

    t0 = time.time()
    sd, _ = jax.block_until_ready(jd(state0, jax.random.fold_in(k_run, 0),
                                     jnp.int32(0)))
    log(f"  default compile+warm {time.time()-t0:.1f}s")
    t0 = time.time()
    sf, _ = jax.block_until_ready(jf(state0, jax.random.fold_in(k_run, 0),
                                     jnp.int32(0)))
    log(f"  fused   compile+warm {time.time()-t0:.1f}s")

    res = {"n_walkers": n_walkers, "d": D, "gens_per_dispatch": GENS,
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
    signal.alarm(120)
    log("backend:", jax.default_backend(), jax.devices())
    np.asarray(jnp.ones(()))

    rows = []
    for n_walkers in (32, 256):
        signal.alarm(900)
        log(f"n_walkers={n_walkers}")
        r = measure(n_walkers)
        rows.append(r)
        log(json.dumps(r))
        with open(os.path.join(HERE, "stretch_fused_ab.json"), "w") as f:
            json.dump(rows, f, indent=1)
    signal.alarm(0)

    print("| walkers | per-gen µs | fused µs | speedup |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['n_walkers']} | {r['default_us_per_gen']:.2f} | "
              f"{r['fused_us_per_gen']:.2f} | {r['speedup']:.2f}× |")


if __name__ == "__main__":
    main()
