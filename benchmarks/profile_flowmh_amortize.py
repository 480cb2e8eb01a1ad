#!/usr/bin/env python
"""A/B: FlowMh generation cost — round-3 engine vs amortized vs fused.

Round-4 verdict item #3: the global-move sampler ran at 565 gens/s on
the headline shape (d=100, 256 chains, K=8 diag GMM) vs 27.7k for plain
DREAM-zs; target >= 5k. Three levers, measured cumulatively here:

- ``diag``: the GMM proposal's density pass drops its K [d,d]
  triangular solves for two MXU matmuls (utils/mixtures.gmm_log_q_diag,
  auto-dispatched) — round-3's arm already fit cov_type="diag" but
  paid the generic solve path;
- ``global_every=G``: the independence move (and its two density
  passes) every G generations instead of every generation — exact
  invariance by kernel composition;
- ``fused=True``: the G×local_moves local-RW block between global moves
  as ONE Pallas kernel (samplers/flowmh_fused.py).

Throughput-only harness (acceptance/mixing quality of the amortized
pipeline is measured end-to-end by benchmarks/northstar_config3.py);
the proposal is fit on synthetic stratified draws to keep the A/B
self-contained. Protocol per arm: one warm run (compile), then a timed
continuation with a final-state value fetch as the barrier
(docs/ROUND3.md §18 methodology).

Writes benchmarks/flowmh_amortize_ab.json and prints a markdown table.
BENCH_SMOKE=1: tiny CPU shapes, writes *_smoke.json.
"""

import json
import os
import sys
import time

import numpy as np

if os.environ.get("JAX_PLATFORMS"):
    import jax
    _plats = os.environ["JAX_PLATFORMS"]
    if "cpu" not in _plats.split(","):
        _plats += ",cpu"
    jax.config.update("jax_platforms", _plats)

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bipymc_tpu as bp
from bipymc_tpu.models.targets import (baseline_config3_means,
                                       gaussian_mixture)
from bipymc_tpu.utils.mixtures import fit_gmm, gmm_proposal

HERE = os.path.dirname(os.path.abspath(__file__))
D, N_CHAINS, K = 100, 256, 8
RUN_GENS = 2000
SMOKE = os.environ.get("BENCH_SMOKE") == "1"
if SMOKE:
    D, N_CHAINS, K, RUN_GENS = 8, 32, 4, 60


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_arm(label, lp, prop, theta0, run_gens, **kw):
    """(gens/s, global acceptance per global gen) with §18 barriers.

    thin MUST stay 1: FlowMh routes fused segments only for thin == 1
    (api.py gate) — the first cut of this harness timed with
    ``thin=run_gens`` and silently measured the per-generation engine
    in every 'fused' arm (round-4 code review; the tell was
    fused_g10 == pergen_g10 within noise in the committed artifact).
    History stays device-resident ([run_gens, n, d] in HBM; _store's
    block_until_ready on it is the timing barrier), and the
    acceptance tail is reduced on device — nothing big crosses the
    tunnel."""
    s = bp.FlowMh(lp, prop, n_chains=N_CHAINS, seed=2, **kw)
    t0 = time.time()
    s.run_mcmc(run_gens, theta0, spread=0.1)
    np.asarray(s.final_state.x[0, 0])
    t_compile = time.time() - t0
    t0 = time.time()
    s.run_mcmc(run_gens)
    np.asarray(s.final_state.x[0, 0])
    wall = time.time() - t0
    g = kw.get("global_every", 1)
    # all chunks, not the last (a segment split can end with a
    # remainder that holds no global generations at all)
    acch = jnp.concatenate([c["accepted"] for c in s._chunks], axis=0)
    acc_per_move = float(jnp.sum(acch[-10 * g:].astype(jnp.float32))
                         / (acch.shape[1] * 10))
    res = {"gens_per_s": round(run_gens / wall, 1),
           "compile_plus_first_run_s": round(t_compile, 2),
           "global_acceptance_per_move": round(acc_per_move, 4)}
    log(f"{label}: {res}")
    return res


def main():
    log("devices:", jax.devices())
    np.asarray(jnp.ones(()))

    means = baseline_config3_means(D)
    lp = gaussian_mixture(means, sigma=1.0)
    rng = np.random.default_rng(0)
    centers = means[np.arange(20000) % means.shape[0]]
    draws = jnp.asarray(centers + rng.standard_normal((20000, D)),
                        jnp.float32)
    params, _ = fit_gmm(jax.random.key(1), draws, K, n_iters=100,
                        cov_type="diag")
    prop = gmm_proposal(params)
    theta0 = jnp.asarray(centers[:N_CHAINS]
                         + rng.standard_normal((N_CHAINS, D)), jnp.float32)

    run = RUN_GENS
    out = {"config": {"d": D, "n_chains": N_CHAINS, "gmm_K": K,
                      "run_gens": run,
                      "round3_gens_per_s": 565.3},
           "arms": {}}
    out["arms"]["pergen_g1"] = measure_arm(
        "pergen_g1 (round-3 config + diag log_q)", lp, prop, theta0, run)
    out["arms"]["pergen_g10"] = measure_arm(
        "pergen_g10", lp, prop, theta0, run, global_every=10)
    out["arms"]["fused_g10"] = measure_arm(
        "fused_g10", lp, prop, theta0, run, global_every=10, fused=True)
    out["arms"]["fused_g25"] = measure_arm(
        "fused_g25", lp, prop, theta0, run, global_every=25, fused=True)

    best = max(v["gens_per_s"] for v in out["arms"].values())
    out["speedup_vs_round3"] = round(best / 565.3, 1)
    if SMOKE:
        out["smoke"] = True
    path = os.path.join(HERE, "flowmh_amortize_ab.json")
    if SMOKE:
        path = path.replace(".json", "_smoke.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)

    print("| arm | gens/s | accept/global-move | compile (s) |")
    print("|---|---|---|---|")
    for name, a in out["arms"].items():
        print(f"| {name} | {a['gens_per_s']} | "
              f"{a['global_acceptance_per_move']} | "
              f"{a['compile_plus_first_run_s']} |")
    print(f"\nbest {best} gens/s = {out['speedup_vs_round3']}x round-3's "
          "565/s")


if __name__ == "__main__":
    main()
