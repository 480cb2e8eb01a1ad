#!/usr/bin/env python
"""A/B: fused multi-step RW engine vs per-step engine (ROUND3 §10).

Config-1 shape (single-chain DRAM on the d=2 correlated Gaussian — the
most dispatch-bound path in the framework: ~1µs of math per ~15µs
dispatch) plus a 256-chain point and a plain-MH arm (no AM replay, no
DR stage — the kernel's best case). One process, variants interleaved
best-of-N (tunnel drift — docs/design.md §10b); per-call floor
amortised over STEPS-step dispatches with async chunk dispatch.

Writes benchmarks/rw_fused_ab.json and prints a markdown table.
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

from bipymc_tpu.models.targets import correlated_gaussian
from bipymc_tpu.samplers import rw
from bipymc_tpu.samplers.rw_fused import make_rw_chunk_runner
from bipymc_tpu.core.scan import run_scan

HERE = os.path.dirname(os.path.abspath(__file__))
STEPS = 20000        # per timed dispatch (multiple of every K below)
CHUNKS = 4


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def setup(n_chains, cfg, seed=0):
    mean = jnp.zeros(2)
    cov = jnp.array([[1.0, 0.9], [0.9, 1.0]])
    lp = correlated_gaussian(mean, cov)
    key = jax.random.key(seed)
    k_x, k_run = jax.random.split(key)
    theta0 = 0.5 * jax.random.normal(k_x, (n_chains, 2))
    cov0 = jnp.broadcast_to(jnp.eye(2), (n_chains, 2, 2))
    state = jax.vmap(lambda th, c: rw.init(th, lp, c))(theta0, cov0)
    return lp, state, k_run


def time_async(runner_call, state, k_run, n_chunks=CHUNKS):
    t0 = time.time()
    h = None
    for c in range(n_chunks):
        state, h = runner_call(state, jax.random.fold_in(k_run, 10 + c),
                               jnp.int32(STEPS * (1 + c)))
    jax.block_until_ready(h)
    return (time.time() - t0) / (n_chunks * STEPS), state


def measure(name, n_chains, cfg, best_of=3):
    lp, state0, k_run = setup(n_chains, cfg)
    step = rw.make_step(lp, cfg)
    cids = jnp.arange(n_chains)

    def batched_step(s, key, t):
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(cids)
        return jax.vmap(step, in_axes=(0, 0, None))(s, keys, t)

    def default_run(state, key, t0_):
        return run_scan(lambda s, k, t: batched_step(s, k, t0_ + t),
                        state, key, STEPS,
                        collect_fn=lambda s, info: s.theta)

    fused = make_rw_chunk_runner(lp, cfg, n_chains, chunk_steps=100)
    K = fused.chunk_multiple
    assert STEPS % K == 0

    def fused_run(state, key, t0_):
        st, hist = fused(state, key, STEPS, t0_)
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

    res = {"variant": name, "n_chains": n_chains, "K": K,
           "steps_per_dispatch": STEPS, "timed_chunks": CHUNKS,
           "best_of": best_of}
    for label, fn, st in (("default", jd, sd), ("fused", jf, sf)):
        best = np.inf
        for r in range(best_of):
            per_step, st = time_async(fn, st, jax.random.fold_in(k_run, r))
            log(f"  {label} rep {r}: {per_step*1e6:.2f} us/step")
            best = min(best, per_step)
        res[label + "_us_per_step"] = best * 1e6
    res["speedup"] = res["default_us_per_step"] / res["fused_us_per_step"]
    return res


def main():
    signal.signal(signal.SIGALRM,
                  lambda *a: (log("watchdog: hung — abort"), os._exit(3)))
    signal.alarm(120)
    log("backend:", jax.default_backend(), jax.devices())
    np.asarray(jnp.ones(()))

    dram = rw.dram_config(adapt_interval=50)
    mh = rw.metropolis_config()
    cases = [
        ("dram", 1, dram),
        ("dram", 256, dram),
        ("mh", 1, mh),
    ]
    rows = []
    for name, n_chains, cfg in cases:
        signal.alarm(900)
        log(f"{name} n_chains={n_chains}")
        r = measure(name, n_chains, cfg)
        rows.append(r)
        log(json.dumps(r))
        with open(os.path.join(HERE, "rw_fused_ab.json"), "w") as f:
            json.dump(rows, f, indent=1)
    signal.alarm(0)

    print("| sampler | chains | per-step µs | fused µs | speedup |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['variant']} | {r['n_chains']} | "
              f"{r['default_us_per_step']:.2f} | "
              f"{r['fused_us_per_step']:.2f} | {r['speedup']:.2f}× |")


if __name__ == "__main__":
    main()
