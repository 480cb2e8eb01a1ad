#!/usr/bin/env python
"""A/B: lax.scan unroll factor for the DREAM-zs generation loop.

The 256-chain step sits near the fusion/dispatch floor (~32µs/gen,
docs/design.md ablation); unrolling the scan body lets XLA fuse across
consecutive generations (e.g. merge adjacent RNG bit-blocks and carry
updates) at the cost of compile time and code size. Same-session
interleaved best-of-3 per unroll factor. Writes
benchmarks/scan_unroll_ab.json.
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bipymc_tpu.models.targets import (baseline_config3_means,
                                       gaussian_mixture,
                                       stratified_mode_init)
from bipymc_tpu.samplers import dream
from bipymc_tpu.core.rng import step_key

HERE = os.path.dirname(os.path.abspath(__file__))
D, N, CHUNK, N_CHUNKS, REPS = 100, 256, 2500, 4, 3


def build(unroll):
    means = baseline_config3_means(D)
    lp = gaussian_mixture(means, sigma=1.0)
    cfg = dream.DreamConfig(n_chains=N, burnin_gens=500)
    key = jax.random.key(0)
    k_x, k_z, _ = jax.random.split(key, 3)
    x0 = stratified_mode_init(k_x, means, N, var=4.0)
    z0 = stratified_mode_init(k_z, means, N, var=4.0)
    state = dream.init(x0, lp, cfg, archive_capacity=8192, z0=z0)
    step = dream.make_step(lp, cfg, axis_name=None)

    def runner(s, key, t0):
        def body(carry, t):
            s = carry
            s, info = step(s, step_key(key, t0 + t), t0 + t)
            return s, None
        ts = jnp.arange(CHUNK, dtype=jnp.int32)
        s, _ = lax.scan(body, s, ts, unroll=unroll)
        return s

    return state, jax.jit(runner)


def main():
    print("backend:", jax.default_backend(), jax.devices(), file=sys.stderr)
    np.asarray(jnp.ones(()))

    variants = {}
    for u in (1, 2, 4):
        s, r = build(u)
        t0 = time.time()
        s2 = jax.block_until_ready(r(s, jax.random.key(0), jnp.int32(0)))
        print(f"unroll={u}: compile+burnin {time.time()-t0:.1f}s",
              file=sys.stderr, flush=True)
        variants[u] = (s2, r)

    times = {u: [] for u in variants}
    for _ in range(REPS):
        for u, (s2, r) in variants.items():
            t0 = time.time()
            s = s2
            for c in range(N_CHUNKS):
                s = r(s, jax.random.key(c + 1),
                      jnp.int32(CHUNK * (c + 1)))
            jax.block_until_ready(s)
            times[u].append(
                (time.time() - t0) / (N_CHUNKS * CHUNK) * 1e6)

    rows = [{"unroll": u, "us_per_gen": round(min(ts), 2),
             "all": [round(t, 2) for t in ts]}
            for u, ts in times.items()]
    with open(os.path.join(HERE, "scan_unroll_ab.json"), "w") as f:
        json.dump(rows, f, indent=1)
    for r_ in rows:
        print(f"unroll={r_['unroll']}: {r_['us_per_gen']} µs/gen "
              f"{r_['all']}")


if __name__ == "__main__":
    main()
