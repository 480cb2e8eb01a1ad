#!/usr/bin/env python
"""A/B: fused Pallas accept/update kernel vs XLA fusions, 256–4096 chains.

Round-2 measured the fused accept kernel 2.8µs/gen SLOWER than XLA at
256×100 and removed it; the round-2 verdict (#6) asked for a re-A/B at
1024–4096 chains, where operand packing amortises. This runs BOTH step
variants (cfg.pallas_accept on/off) in ONE process per chain count —
same-session comparison only (the axon tunnel drifts ±35% across
sessions) — with ≥2000-gen async-dispatched chunks to amortise the
~30ms/call floor. Best-of-3 per variant, interleaved A/B/A/B to cancel
slow thermal/clock drift. Writes benchmarks/accept_fusion_ab.json.
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bipymc_tpu.models.targets import (baseline_config3_means,
                                       gaussian_mixture,
                                       stratified_mode_init)
from bipymc_tpu.samplers import dream
from bipymc_tpu.core.scan import run_scan

HERE = os.path.dirname(os.path.abspath(__file__))
D = 100
CHUNK = 2500
N_CHUNKS = 4
REPS = 3


def build_runner(n_chains, pallas_accept):
    means = baseline_config3_means(D)
    lp = gaussian_mixture(means, sigma=1.0)
    cfg = dream.DreamConfig(n_chains=n_chains, burnin_gens=500,
                            pallas_accept=pallas_accept)
    key = jax.random.key(0)
    k_x, k_z, _ = jax.random.split(key, 3)
    x0 = stratified_mode_init(k_x, means, n_chains, var=4.0)
    z0 = stratified_mode_init(k_z, means, n_chains, var=4.0)
    state = dream.init(x0, lp, cfg, archive_capacity=8192, z0=z0)
    step = dream.make_step(lp, cfg, axis_name=None)

    runner = jax.jit(lambda s, k, t0: run_scan(
        lambda ss, kk, tt: step(ss, kk, t0 + tt), s, k, CHUNK,
        collect_fn=lambda ss, info: info.accepted))
    return state, runner


def time_variant(state, runner, tag):
    """One timed pass: N_CHUNKS async chunks, µs/gen."""
    t0 = time.time()
    s = state
    for c in range(N_CHUNKS):
        s, _ = runner(s, jax.random.key(c + 1), jnp.int32(500 + c * CHUNK))
    jax.block_until_ready(s)
    el = time.time() - t0
    return el / (N_CHUNKS * CHUNK) * 1e6


def main():
    print("backend:", jax.default_backend(), jax.devices(), file=sys.stderr)
    np.asarray(jnp.ones(()))

    results = []
    for n_chains in (256, 1024, 4096):
        variants = {}
        for pa in (False, True):
            s, r = build_runner(n_chains, pa)
            s2, _ = r(s, jax.random.key(0), jnp.int32(0))  # compile+burn-in
            jax.block_until_ready(s2)
            variants[pa] = (s2, r)
        # interleaved best-of-REPS
        times = {False: [], True: []}
        for _ in range(REPS):
            for pa in (False, True):
                s2, r = variants[pa]
                times[pa].append(time_variant(s2, r, pa))
        row = {
            "n_chains": n_chains,
            "xla_us_per_gen": min(times[False]),
            "fused_us_per_gen": min(times[True]),
            "all_xla": [round(t, 2) for t in times[False]],
            "all_fused": [round(t, 2) for t in times[True]],
        }
        row["fused_minus_xla_us"] = round(
            row["fused_us_per_gen"] - row["xla_us_per_gen"], 2)
        results.append(row)
        print(json.dumps(row), file=sys.stderr, flush=True)

    with open(os.path.join(HERE, "accept_fusion_ab.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("| chains | XLA µs/gen | fused µs/gen | Δ (fused−XLA) |")
    print("|---|---|---|---|")
    for r in results:
        print(f"| {r['n_chains']} | {r['xla_us_per_gen']:.1f} | "
              f"{r['fused_us_per_gen']:.1f} | {r['fused_minus_xla_us']} |")


if __name__ == "__main__":
    main()
