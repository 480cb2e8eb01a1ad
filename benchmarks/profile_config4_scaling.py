#!/usr/bin/env python
"""Config-4 utilization profile (round-3 verdict #4).

BASELINE config 4 (GP log-ML hyperparameter inference) is the one
FLOP-bound eval config — each likelihood eval is a kernel-matrix build +
Cholesky — yet round 2 benchmarked it at 4 chains ≈ 0.5% of chip peak.
The batch (chain) dimension is free MXU parallelism for the vmapped
Cholesky, so this script measures:

1. chain-scaling at n=512: chains ∈ {4, 16, 64, 256} — steps/s,
   Cholesky evals/s, achieved GFLOP/s vs the ~49 f32 TFLOP/s v5e peak;
2. large-n points (n=2048): the per-eval FLOPs grow ~n³ and a single
   factorisation starts to tile the MXU on its own.

All variants run in ONE process (axon tunnel drifts ±35% across
sessions — docs/design.md §10b); per-variant timing amortises the ~30ms
per-call floor over one long continuation run. Writes
benchmarks/config4_scaling.json and prints a markdown table.
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bipymc_tpu as bp
from bipymc_tpu.gp.regressor import GpRegressor

HERE = os.path.dirname(os.path.abspath(__file__))
V5E_F32_PEAK_GFLOPS = 49_000.0   # ~49 TFLOP/s f32 nominal bound (2x bf16)


def make_log_post(n_train, seed=7):
    """The config-4 posterior: GP log-ML at fixed data + weak prior
    (same construction as run_all.config4, parameterised by n_train).

    batched_chol is PINNED OFF: this script documents the XLA-baseline
    scaling plateau that motivated ops/pallas_bchol.py — with the
    (now-default) dispatch on, the >=8-chain rows would silently measure
    the Pallas kernel and the artifact's central claim would become
    unreproducible. The Pallas side is measured by profile_bchol.py.
    """
    rng = np.random.default_rng(seed)
    x = rng.uniform(-4, 4, (n_train, 2)).astype(np.float32)
    f = np.sin(2 * x[:, 0]) * np.cos(x[:, 1])
    y = (f + rng.normal(0, 0.2, n_train)).astype(np.float32)
    gp = GpRegressor(batched_chol=False)
    xj, yj = jnp.asarray(x), jnp.asarray(y)

    def log_post(theta):
        p = {"log_lengthscale": theta[0:2], "log_sigma_f": theta[2],
             "log_sigma_n": theta[3]}
        return gp._lml_impl(p, xj, yj) - 0.5 * jnp.sum((theta / 2.0) ** 2)

    return log_post


def flops_per_eval(n, d=2):
    """FLOPs of one likelihood eval: Cholesky n³/3 dominates; plus the
    pairwise build (~3n²d) and two triangular solves (2n²)."""
    return n ** 3 / 3 + 3 * n ** 2 * d + 2 * n ** 2


def measure(n_train, n_chains, n_steps):
    lp = make_log_post(n_train)
    s = bp.Dram(lp, seed=1, n_chains=n_chains)
    s.run_mcmc(n_steps, jnp.zeros(4), cov_est=jnp.eye(4) * 0.05)  # compile
    t0 = time.time()
    s.run_mcmc(n_steps)                                   # continuation
    elapsed = time.time() - t0
    evals = 2 * n_chains * n_steps          # DR: 2 stages per step/chain
    gflops = evals * flops_per_eval(n_train) / elapsed / 1e9
    return {
        "n_train": n_train, "n_chains": n_chains, "n_steps": n_steps,
        "steps_per_sec": n_steps / elapsed,
        "chain_steps_per_sec": n_chains * n_steps / elapsed,
        "cholesky_evals_per_sec": evals / elapsed,
        "achieved_gflops": gflops,
        "pct_of_f32_peak": 100.0 * gflops / V5E_F32_PEAK_GFLOPS,
    }


DEFAULT_ROWS = "512:4:2000,512:16:2000,512:64:2000,512:256:600," \
               "2048:4:300,2048:16:300,2048:64:150"


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", default=DEFAULT_ROWS,
                    help="comma list of n_train:n_chains:n_steps specs; "
                         "measured rows MERGE into config4_scaling.json "
                         "(keyed by n_train+n_chains), so a tunnel flap "
                         "loses at most one row")
    specs = [tuple(int(v) for v in s.split(":"))
             for s in ap.parse_args().rows.split(",") if s]

    print("backend:", jax.default_backend(), jax.devices(), file=sys.stderr)
    np.asarray(jnp.ones(()))                 # device-tunnel warmup

    path = os.path.join(HERE, "config4_scaling.json")
    try:
        with open(path) as f:
            doc = json.load(f)
    except (OSError, ValueError):
        doc = {}

    for n_train, n_chains, n_steps in specs:
        r = measure(n_train, n_chains, n_steps)
        print(json.dumps(r), file=sys.stderr, flush=True)
        sec = doc.setdefault(f"sampler_n{n_train}", [])
        sec[:] = [q for q in sec if q.get("n_chains") != n_chains]
        sec.append(r)
        sec.sort(key=lambda q: q["n_chains"])
        with open(path, "w") as f:          # write-through per row
            json.dump(doc, f, indent=1)

    rows = [r for k, sec in sorted(doc.items()) if k.startswith("sampler_n")
            for r in sec if "n_train" in r]   # skip e2e-A/B sections
    print("| n | chains | chol/s | GFLOP/s | % f32 peak |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['n_train']} | {r['n_chains']} | "
              f"{r['cholesky_evals_per_sec']:,.0f} | "
              f"{r['achieved_gflops']:,.0f} | "
              f"{r['pct_of_f32_peak']:.1f} |")


if __name__ == "__main__":
    main()
