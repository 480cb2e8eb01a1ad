#!/usr/bin/env python
"""Walk move vs stretch move: the ensemble-proposal A/B (ROUND3 §43).

Both moves are affine-invariant, so the anisotropic target (scales
1..100, condition 1e4) is neutral ground; what differs is the proposal
geometry and its cost:

- stretch: 1-d move along the line to ONE complementary walker;
  acceptance decays ~ per-dim with the a=2 stretch factor; cost is
  2 likelihood evals + O(d) arithmetic per walker-generation.
- walk (emcee WalkMove, s = whole complementary half): full-rank
  Gaussian kick with the frozen half's sample covariance; emcee keeps
  the RAW covariance (no 2.38²/d optimal-scaling factor), so
  acceptance ALSO decays with d — the well-known RW-MH way — while
  paying one d×d Cholesky + a [n/2, d]×[d, d] matmul per half-update
  (MXU work the stretch move doesn't have).

Measures gens/sec, windowed ESS/sec, and acceptance per (move, d,
walkers) arm. Methodology: warm chunk (compile), timed async chunks
with a value-fetch barrier (§18), windowed ESS estimator from
bench.py. Writes benchmarks/walk_ab.json, prints a markdown table.
"""

import json
import os
import sys
import time

import numpy as np

if os.environ.get("JAX_PLATFORMS"):
    # the axon sitecustomize pins the TPU platform programmatically and
    # ignores the env var; honour an explicit CPU-smoke override the way
    # bench.py does
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bipymc_tpu.samplers import stretch
from bipymc_tpu.core.scan import run_scan_thinned
from bipymc_tpu.utils.diagnostics import ess_rate

HERE = os.path.dirname(os.path.abspath(__file__))
WARM_GENS = 1000
CHUNK = 1000
CHUNKS = 4
SMOKE = os.environ.get("BENCH_SMOKE") == "1"
if SMOKE:
    WARM_GENS, CHUNK, CHUNKS = 60, 50, 2


def scales_for(d):
    return np.logspace(0, 2, d).astype(np.float32)    # 1..100


def log_prob_for(d):
    inv_var = jnp.asarray(1.0 / scales_for(d) ** 2)

    def log_prob(theta):
        return -0.5 * jnp.sum(theta * theta * inv_var)

    return log_prob


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_arm(name, move, d, n_walkers, seed=0):
    log_prob = log_prob_for(d)
    cfg = stretch.StretchConfig(n_chains=n_walkers, move=move)
    kx = jax.random.key(seed)
    x0 = jax.random.normal(kx, (n_walkers, d)) * jnp.asarray(scales_for(d))
    state = stretch.init(x0, log_prob)
    step = stretch.make_step(log_prob, cfg)
    collect = lambda s, i: {"x": s.x, "accepted": i.accepted}
    runners = {}

    def runner(s, key, t):
        n = WARM_GENS if int(t) == 0 else CHUNK
        if n not in runners:
            runners[n] = jax.jit(lambda s_, k_, t_, _n=n: run_scan_thinned(
                step, s_, k_, _n, thin=1, collect_fn=collect, t0=t_))
        return runners[n](s, key, t)

    k_run = jax.random.key(seed + 100)
    t0 = time.time()
    state, h = runner(state, jax.random.fold_in(k_run, 0), jnp.int32(0))
    np.asarray(h["x"][-1, 0])                            # value barrier
    log(f"{name}: compile + {WARM_GENS} warm gens {time.time() - t0:.1f}s")
    hists, accs = [], []
    t0 = time.time()
    for c in range(CHUNKS):
        state, h = runner(state, jax.random.fold_in(k_run, 1 + c),
                          jnp.int32(WARM_GENS + c * CHUNK))
        hists.append(h["x"])
        accs.append(h["accepted"])
    jax.block_until_ready(hists)
    np.asarray(hists[-1][-1, 0])
    dt = time.time() - t0
    n_gens = CHUNKS * CHUNK
    chains = np.swapaxes(
        np.concatenate([np.asarray(x) for x in hists], axis=0), 0, 1)
    gps = n_gens / dt
    ess, eps = ess_rate(chains, gps)
    acc = float(np.mean(np.concatenate([np.asarray(a) for a in accs])))
    log(f"{name}: {gps:,.0f} gens/s, ESS {ess:,.0f}, {eps:,.0f} ESS/s, "
        f"accept {acc:.2f}")
    return {"gens_per_sec": gps, "us_per_gen": 1e6 * dt / n_gens,
            "ess": float(ess), "ess_per_sec": eps, "accept": acc}


def main():
    dims = (4,) if SMOKE else (16, 64)
    walkers = (16,) if SMOKE else (32, 256)
    results = {}
    for d in dims:
        for n in walkers:
            for move in ("stretch", "walk"):
                results[f"{move}_d{d}_{n}"] = run_arm(
                    f"{move}/d{d}/{n}", move, d, n)
    results["config"] = {"dims": list(dims), "scales": "logspace(0,2)",
                         "warm_gens": WARM_GENS,
                         "timed_gens": CHUNK * CHUNKS, "smoke": SMOKE}
    path = os.path.join(HERE, "walk_ab.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    log(f"wrote {path}")
    print("| arm | gens/s | µs/gen | ESS/s | accept |")
    print("|---|---|---|---|---|")
    for k, r in results.items():
        if k == "config":
            continue
        print(f"| {k} | {r['gens_per_sec']:,.0f} | {r['us_per_gen']:.1f} "
              f"| {r['ess_per_sec']:,.0f} | {r['accept']:.2f} |")


if __name__ == "__main__":
    main()
