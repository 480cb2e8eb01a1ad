#!/usr/bin/env python
"""Ensemble slice vs stretch: anisotropy and dimension (ROUND3 §34).

The pitch for ensemble slice sampling is no-knobs robustness: the
slice move accepts by construction and only its COST adapts (μ tuning
+ bracket expansion), where the stretch move's acceptance decays. The
price is data-dependent while_loops whose per-generation device cost
is the batch MAX of (2 + n_expand + n_contract) target evals.

Two axes, separated deliberately:
- anisotropy (d=16, scales 1..100, condition 1e4): stretch is
  AFFINE-INVARIANT, so this is its best case — the honest control arm
  (the first draft pitched anisotropy as stretch-hostile; it is not).
- dimension (d=64, same scale spread): stretch acceptance decays
  ~ per-dim with the a=2 stretch factor while slice stays at 1.0 —
  the regime the no-knobs property is actually for.

Walkers 32 and 256 per (sampler, d) arm, default configs:
- EnsembleSlice: μ tuned during the warm phase, frozen in the timed
  window (tune_gens = WARM_GENS).
- EnsembleSampler (stretch): a=2.

Methodology: warm/adapt phase (compile + tuning), then timed async
chunks with a value-fetch barrier (§18); ESS via the windowed estimator
bench.py uses. Writes benchmarks/enslice_ab.json, prints a markdown
table to stdout.

``--expensive`` runs the third axis: TARGET COST. §34's table recorded
the cheap-target negative and *predicted* a crossover once the
likelihood dominates the step — but the prediction used the per-walker
mean eval count (3.8 vs stretch's fixed 2, ratio 1.9×), while the
vmapped while_loops actually pay the BATCH-MAX count per generation
(finished lanes still ride the masked batch eval). This mode measures
which ratio governs, on a data-sized Bayesian linear-regression
posterior (d=64, n_data=131072: each batched eval streams a 33 MB
design matrix — HBM-bound, ~the cost class of any real data-sized
likelihood). Writes benchmarks/enslice_expensive_ab.json.
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bipymc_tpu.samplers import enslice, stretch
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


def run_arm(name, state, runner, k_run, has_counts=False):
    t0 = time.time()
    state, h = runner(state, jax.random.fold_in(k_run, 0), jnp.int32(0))
    np.asarray(jax.tree_util.tree_leaves(h)[0][-1, 0])   # value barrier
    log(f"{name}: compile + {WARM_GENS} warm/tune gens "
        f"{time.time() - t0:.1f}s")
    hists, counts, accs = [], [], []
    t0 = time.time()
    for c in range(CHUNKS):
        state, h = runner(state, jax.random.fold_in(k_run, 1 + c),
                          jnp.int32(WARM_GENS + c * CHUNK))
        hists.append(h["x"])
        accs.append(h["accepted"])
        if has_counts:
            counts.append(h["n_expand"] + h["n_contract"])
    jax.block_until_ready(hists)
    np.asarray(hists[-1][-1, 0])
    dt = time.time() - t0
    n_gens = CHUNKS * CHUNK
    chains = np.swapaxes(
        np.concatenate([np.asarray(x) for x in hists], axis=0), 0, 1)
    gps = n_gens / dt
    ess, eps = ess_rate(chains, gps)
    acc = float(np.mean(np.concatenate([np.asarray(a) for a in accs])))
    out = {"gens_per_sec": gps, "us_per_gen": 1e6 * dt / n_gens,
           "ess": float(ess), "ess_per_sec": eps, "accept": acc}
    if has_counts:
        cnt = np.concatenate([np.asarray(c) for c in counts], axis=0)
        out["evals_per_walker_gen"] = float(2.0 + cnt.mean())
        out["evals_batch_max_mean"] = float(2.0 + cnt.max(axis=1).mean())
    log(f"{name}: {gps:,.0f} gens/s, ESS {ess:,.0f}, {eps:,.0f} ESS/s, "
        f"accept {acc:.2f}" + (
            f", evals/gen {out['evals_per_walker_gen']:.1f} "
            f"(batch-max {out['evals_batch_max_mean']:.1f})"
            if has_counts else ""))
    return out


def x0_for(d, n, seed):
    kx = jax.random.key(seed)
    return jax.random.normal(kx, (n, d)) * jnp.asarray(scales_for(d))


N_DATA = 2048 if SMOKE else 32768


def expensive_target_for(d, n_data=N_DATA):
    """Data-sized Bayesian linear regression: the eval streams a
    (n_data, d) design matrix (8 MB at d=64) plus a (n_walkers, n_data)
    residual block through HBM — the cost class of any real data-sized
    likelihood, and deliberately NOT collapsed to the d×d sufficient
    statistics (we are buying an expensive eval on purpose)."""
    ka, ky = jax.random.split(jax.random.key(77))
    col = jnp.asarray(scales_for(d))
    A = jax.random.normal(ka, (n_data, d), jnp.float32) * col
    y = jax.random.normal(ky, (n_data,), jnp.float32)   # truth θ*=0, σ=1

    def log_prob(theta):
        r = A @ theta - y
        return -0.5 * jnp.dot(r, r) - 0.5 * jnp.dot(theta, theta)

    # per-dim posterior sd ≈ 1/(√n_data · colscale); overdisperse ×5
    sd = 1.0 / (np.sqrt(n_data) * scales_for(d))
    return log_prob, jnp.asarray(5.0 * sd)


def measure_eval_cost(log_prob, n_walkers, d, x0_sd, reps=50):
    """µs per BATCHED (all-walker) target eval, value-barrier timed."""
    f = jax.jit(jax.vmap(log_prob))
    x = jax.random.normal(jax.random.key(3), (n_walkers, d)) * x0_sd
    np.asarray(f(x))                                    # compile
    t0 = time.time()
    for _ in range(reps):
        out = f(x)
    np.asarray(out)
    return 1e6 * (time.time() - t0) / reps


def run_enslice(d, n_walkers, seed=0, log_prob=None, x0=None, tag=""):
    log_prob = log_prob or log_prob_for(d)
    cfg = enslice.EnsliceConfig(n_chains=n_walkers, tune_gens=WARM_GENS)
    state = enslice.init(x0 if x0 is not None else
                         x0_for(d, n_walkers, seed), log_prob, cfg)
    step = enslice.make_step(log_prob, cfg)
    collect = lambda s, i: {"x": s.x, "accepted": i.accepted,
                            "n_expand": i.n_expand,
                            "n_contract": i.n_contract}
    runners = {}

    def runner(s, key, t):
        n = WARM_GENS if int(t) == 0 else CHUNK
        if n not in runners:
            runners[n] = jax.jit(lambda s_, k_, t_, _n=n: run_scan_thinned(
                step, s_, k_, _n, thin=1, collect_fn=collect, t0=t_))
        return runners[n](s, key, t)

    return run_arm(f"enslice{tag}/d{d}/{n_walkers}", state, runner,
                   jax.random.key(seed + 100), has_counts=True)


def run_stretch(d, n_walkers, seed=0, log_prob=None, x0=None, tag=""):
    log_prob = log_prob or log_prob_for(d)
    cfg = stretch.StretchConfig(n_chains=n_walkers)
    state = stretch.init(x0 if x0 is not None else
                         x0_for(d, n_walkers, seed), log_prob)
    step = stretch.make_step(log_prob, cfg)
    collect = lambda s, i: {"x": s.x, "accepted": i.accepted}
    runners = {}

    def runner(s, key, t):
        n = WARM_GENS if int(t) == 0 else CHUNK
        if n not in runners:
            runners[n] = jax.jit(lambda s_, k_, t_, _n=n: run_scan_thinned(
                step, s_, k_, _n, thin=1, collect_fn=collect, t0=t_))
        return runners[n](s, key, t)

    return run_arm(f"stretch{tag}/d{d}/{n_walkers}", state, runner,
                   jax.random.key(seed + 200))


def main_expensive():
    d, n = (4, 16) if SMOKE else (64, 256)
    log_prob, x0_sd = expensive_target_for(d)
    eval_us = measure_eval_cost(log_prob, n, d, x0_sd)
    log(f"batched ({n}-walker) eval cost: {eval_us:.1f} µs "
        f"(n_data={N_DATA})")
    kx = jax.random.key(9)
    x0 = jax.random.normal(kx, (n, d)) * x0_sd
    results = {"eval_us_batched": eval_us, "n_data": N_DATA}
    results[f"enslice_exp_d{d}_{n}"] = run_enslice(
        d, n, log_prob=log_prob, x0=x0, tag="-exp")
    results[f"stretch_exp_d{d}_{n}"] = run_stretch(
        d, n, log_prob=log_prob, x0=x0, tag="-exp")
    e, s = results[f"enslice_exp_d{d}_{n}"], results[f"stretch_exp_d{d}_{n}"]
    results["cost_ratio_measured"] = s["gens_per_sec"] / e["gens_per_sec"]
    results["config"] = {"d": d, "walkers": n, "warm_gens": WARM_GENS,
                         "timed_gens": CHUNK * CHUNKS, "smoke": SMOKE}
    path = os.path.join(HERE, "enslice_expensive_ab.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    log(f"wrote {path}")
    print("| arm | gens/s | µs/gen | ESS/s | accept | evals/walker-gen |")
    print("|---|---|---|---|---|---|")
    for k in (f"enslice_exp_d{d}_{n}", f"stretch_exp_d{d}_{n}"):
        r = results[k]
        ev = (f"{r['evals_per_walker_gen']:.1f} "
              f"(max {r['evals_batch_max_mean']:.1f})"
              if "evals_per_walker_gen" in r else "2 (fixed)")
        print(f"| {k} | {r['gens_per_sec']:,.0f} | {r['us_per_gen']:.1f} "
              f"| {r['ess_per_sec']:,.0f} | {r['accept']:.2f} | {ev} |")
    print(f"measured per-gen cost ratio (enslice/stretch): "
          f"{results['cost_ratio_measured']:.2f}x; batched eval "
          f"{eval_us:.1f} µs")


def main():
    dims = (4,) if SMOKE else (16, 64)
    walkers = (16,) if SMOKE else (32, 256)
    results = {}
    for d in dims:
        for n in walkers:
            results[f"enslice_d{d}_{n}"] = run_enslice(d, n)
            results[f"stretch_d{d}_{n}"] = run_stretch(d, n)
    results["config"] = {"dims": list(dims), "scales": "logspace(0,2)",
                         "warm_gens": WARM_GENS,
                         "timed_gens": CHUNK * CHUNKS, "smoke": SMOKE}
    path = os.path.join(HERE, "enslice_ab.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    log(f"wrote {path}")
    print("| arm | gens/s | µs/gen | ESS/s | accept | evals/walker-gen |")
    print("|---|---|---|---|---|---|")
    for k, r in results.items():
        if k == "config":
            continue
        ev = (f"{r['evals_per_walker_gen']:.1f} "
              f"(max {r['evals_batch_max_mean']:.1f})"
              if "evals_per_walker_gen" in r else "2 (fixed)")
        print(f"| {k} | {r['gens_per_sec']:,.0f} | {r['us_per_gen']:.1f} "
              f"| {r['ess_per_sec']:,.0f} | {r['accept']:.2f} | {ev} |")


if __name__ == "__main__":
    if "--expensive" in sys.argv:
        main_expensive()
    else:
        main()
