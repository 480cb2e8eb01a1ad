#!/usr/bin/env python
"""Global moves on the headline target: measured cross-mode mixing.

docs/ROUND3.md §2 measured the DE/archive family's inter-mode transplant
rate on BASELINE config 3 (100-d 4-mode mixture) at **2.8e-5 per
chain-generation** — mode weights frozen at init for any practical
window, cross-mode R̂ < 1.1 structurally unreachable. §21's SMC answer
anneals a fresh population; this harness measures the MCMC-side answer
(samplers/flowmh.py): fit a proposal density to a stratified exploratory
run, then run independence global moves. Acceptance is set by the fit
(KL(π‖q)), NOT by mode separation, so the transplant rate is the
acceptance rate.

Proposal arms:
- **GMM (default)**: EM mixture (utils/mixtures.py) — the exact family
  for this target; K is set ABOVE the true mode count (no cheating on
  K; dead components vanish under EM).
- **flow** (``FLOW_ARM=1``): RealNVP — measures how the neural fit's
  acceptance decays with d (it collapsed to ~4e-4 already at d=16).

Protocol (real chip; BENCH_SMOKE=1 → d=8 CPU smoke):
1. exploratory stratified DreamZs (256 chains), draws thinned to the
   proposal's training set;
2. fit on-device;
3. `bp.FlowMh` from a COLLAPSED init (all 256 chains in mode 0):
   - time-to-reequilibration (first generation with every mode holding
     ≥ half its fair share),
   - global-move acceptance (the measured transplant rate, to compare
     with 2.8e-5),
   - cross-mode split-R̂ on the equilibrated window,
   - generations/sec (timed continuation, §18 value-fetch barriers).

Writes benchmarks/flowmh_headline.json and prints a markdown row.
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
from bipymc_tpu.utils.diagnostics import mode_occupancy
from bipymc_tpu.utils.flows import flow_config

HERE = os.path.dirname(os.path.abspath(__file__))
D = 100
N_CHAINS = 256
SPREAD = 5.0
EXPLORE_GENS, EXPLORE_BURN = 3000, 500
GMM_K, GMM_ITERS, GMM_MAX_PTS = 8, 200, 50000
FIT_STEPS, FLOW_LAYERS, FLOW_HIDDEN = 4000, 8, 256
RUN_GENS = 2000
FLOW_ARM = os.environ.get("FLOW_ARM") == "1"
SMOKE = os.environ.get("BENCH_SMOKE") == "1"
if SMOKE:
    D, N_CHAINS, EXPLORE_GENS, EXPLORE_BURN = 8, 64, 600, 200
    GMM_K, GMM_ITERS, GMM_MAX_PTS = 6, 80, 10000
    FIT_STEPS, FLOW_LAYERS, FLOW_HIDDEN = 800, 6, 48
    RUN_GENS = 400


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_arm(name, proposal, log_prob, means, means_j, flow_cfg=None):
    """Run FlowMh from the collapsed init; return (metrics dict,
    equilibrated second-half draws [N·T/2, d] for refitting)."""
    theta_0 = jnp.asarray(np.tile(means[0], (N_CHAINS, 1)))
    kw = {"flow_config": flow_cfg} if flow_cfg is not None else {}
    s = bp.FlowMh(log_prob, proposal, n_chains=N_CHAINS, seed=2, **kw)
    t0 = time.time()
    s.run_mcmc(RUN_GENS, theta_0, spread=0.1)    # compile + run
    sc = s.super_chain                           # fetch barrier [N, T, d]
    t_first = time.time() - t0

    # time-to-reequilibration: first kept generation where every mode
    # holds >= half its fair share
    fair = N_CHAINS // means.shape[0]
    t_eq = None
    occ_final = None
    for t in range(sc.shape[1]):
        occ = np.asarray(mode_occupancy(jnp.asarray(sc[:, t, :]), means_j))
        occ_final = occ
        if t_eq is None and occ.min() >= fair // 2:
            t_eq = t
    acc_global = float(s.global_acceptance_fraction.mean())

    window = sc[:, RUN_GENS // 2:, :]
    rhat = float(np.max(np.asarray(bp.gelman_rubin(jnp.asarray(window)))))
    err = float(np.max(np.abs(window.mean(axis=(0, 1)) - means.mean(0))))

    # timed continuation (compiled path, §18 barriers)
    t0 = time.time()
    s.run_mcmc(RUN_GENS, thin=RUN_GENS)          # keep 1 row: fetch-light
    np.asarray(s.final_state.x[0, 0])
    wall = time.time() - t0
    return window.reshape(-1, window.shape[-1]), {
        "compile_plus_first_run_s": round(t_first, 2),
        "gens_per_s": round(RUN_GENS / wall, 1),
        "global_acceptance": round(acc_global, 4),
        "transplant_speedup_vs_de": round(acc_global / 2.8e-5, 0),
        "gens_to_reequilibrate": t_eq,
        "occupancy_final": occ_final.tolist(),
        "occupancy_fair": [fair] * means.shape[0],
        "cross_mode_rhat": round(rhat, 4),
        "posterior_mean_abs_err": round(err, 3),
    }


def main():
    log("devices:", jax.devices())
    np.asarray(jnp.ones(()))

    means = baseline_config3_means(D, spread=SPREAD)
    log_prob = gaussian_mixture(means, sigma=1.0)
    means_j = jnp.asarray(means)

    # 1. exploratory stratified run (the §2 honest-multimodality recipe)
    t0 = time.time()
    x0 = bp.stratified_mode_init(jax.random.key(0), means_j, N_CHAINS,
                                 var=4.0)
    on_tpu = jax.default_backend() not in ("cpu",)
    explore = bp.DreamZs(log_prob, n_chains=N_CHAINS, seed=0,
                         burnin_gens=EXPLORE_BURN, fused=True,
                         fused_rng="kernel" if on_tpu else "stream")
    explore.run_mcmc(EXPLORE_GENS, x0, thin=4)
    draws = explore.get_chain(discard=EXPLORE_BURN // 4, flat=True)
    t_explore = time.time() - t0
    log(f"explore: {draws.shape} draws in {t_explore:.1f}s")

    out = {
        "config": {"d": D, "n_chains": N_CHAINS,
                   "gmm": {"K": GMM_K, "iters": GMM_ITERS,
                           "max_points": GMM_MAX_PTS},
                   "explore_gens": EXPLORE_GENS, "run_gens": RUN_GENS},
        "explore_wall_s": round(t_explore, 2),
        "de_channel_hop_rate_round3": 2.8e-5,
    }

    # 2a. GMM arm (default)
    t0 = time.time()
    # diag covariance: at d=100 a full covariance costs d(d+1)/2
    # params/component and the estimation error alone caps the
    # acceptance (see fit_gmm docstring); the headline target's
    # basins are isotropic, so diag is the exact family
    gparams, ginfo = bp.fit_gmm(jax.random.key(1), jnp.asarray(draws),
                                GMM_K, n_iters=GMM_ITERS,
                                max_points=GMM_MAX_PTS, cov_type="diag")
    gll = float(ginfo["final_loglik"])           # barrier: value fetch
    t_gfit = time.time() - t0
    log(f"gmm fit: {t_gfit:.1f}s, final mean log lik = {gll:.2f}")
    out["gmm_fit_wall_s"] = round(t_gfit, 2)
    out["gmm_final_loglik"] = round(gll, 3)
    eq_draws, out["gmm"] = measure_arm("gmm", bp.gmm_proposal(gparams),
                                       log_prob, means, means_j)
    log("gmm arm:", out["gmm"])

    # flowMC iterate: refit on the global-move run's own equilibrated
    # draws (decorrelated by the independence moves → higher n_eff)
    gparams2, _ = bp.fit_gmm(jax.random.key(3), jnp.asarray(eq_draws),
                             GMM_K, n_iters=GMM_ITERS,
                             max_points=GMM_MAX_PTS, cov_type="diag")
    _, out["gmm_refit"] = measure_arm("gmm_refit",
                                      bp.gmm_proposal(gparams2),
                                      log_prob, means, means_j)
    log("gmm refit arm:", out["gmm_refit"])

    # 2b. flow arm (optional — the d-scaling measurement)
    if FLOW_ARM or SMOKE:
        cfg = flow_config(n_layers=FLOW_LAYERS, hidden=FLOW_HIDDEN,
                          n_steps=FIT_STEPS, step_size=2e-3,
                          batch_size=8192)
        t0 = time.time()
        fparams, finfo = bp.fit_flow(jax.random.key(2),
                                     jnp.asarray(draws), cfg)
        floss = float(finfo["final_loss"])
        t_ffit = time.time() - t0
        log(f"flow fit: {t_ffit:.1f}s, final mean -log q = {floss:.2f}")
        out["flow_fit_wall_s"] = round(t_ffit, 2)
        out["flow_final_neg_log_q"] = round(floss, 3)
        _, out["flow"] = measure_arm("flow", fparams, log_prob, means,
                                     means_j, flow_cfg=cfg)
        log("flow arm:", out["flow"])

    if SMOKE:
        out["smoke"] = True
    path = os.path.join(HERE, "flowmh_headline.json")
    if SMOKE:
        path = path.replace(".json", "_smoke.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    g = out["gmm"]
    print("| arm | acc | t_eq (gens) | occupancy | cross-mode R̂ | "
          "gens/s | fit (s) |")
    print("|---|---|---|---|---|---|---|")
    print(f"| gmm | {g['global_acceptance']} | "
          f"{g['gens_to_reequilibrate']} | {g['occupancy_final']} | "
          f"{g['cross_mode_rhat']} | {g['gens_per_s']} | "
          f"{out['gmm_fit_wall_s']} |")
    r = out["gmm_refit"]
    print(f"| gmm refit | {r['global_acceptance']} | "
          f"{r['gens_to_reequilibrate']} | {r['occupancy_final']} | "
          f"{r['cross_mode_rhat']} | {r['gens_per_s']} | — |")
    if "flow" in out:
        fl = out["flow"]
        print(f"| flow | {fl['global_acceptance']} | "
              f"{fl['gens_to_reequilibrate']} | {fl['occupancy_final']} | "
              f"{fl['cross_mode_rhat']} | {fl['gens_per_s']} | "
              f"{out['flow_fit_wall_s']} |")


if __name__ == "__main__":
    main()
