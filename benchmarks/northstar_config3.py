#!/usr/bin/env python
"""North-star pipeline — BASELINE config 3, cold start → cross-mode R̂<1.1.

`BASELINE.json:2` names wall-clock to R̂<1.1 a north-star metric; on the
100-d 4-mode mixture the number only counts if the R̂ is CROSS-mode
(mode-hopping mixing), which no DE/archive kernel reaches in practice
(measured hop rate 2.8e-5/chain-gen — docs/ROUND3.md §2). Round 3 built
the ingredients separately: stratified exploration, an on-device EM GMM
fit (utils/mixtures.py), and the FlowMh global-move kernel that reached
cross-mode R̂ 1.0013 (benchmarks/flowmh_headline.json) — but no single
harness composed them into one cold-start number (round-4 verdict #1).
This harness is that composition:

  A explore   stratified 256-chain DreamZs (fused engine, kernel RNG),
              thinned history kept DEVICE-RESIDENT (no host round-trip
              into the fit),
  B fit       diagonal-covariance EM GMM, k-means++ seeds × 4 restarts,
              jitted end-to-end,
  C bridge    a short FlowMh run under the first fit, then REFIT on its
              decorrelated draws (the flowMC iterate — round 3 measured
              first-fit global acceptance 0.127 vs 0.717 after one
              refit: explore draws are autocorrelated, so the variance
              estimates that set exp(−KL(π‖q)) are noisy; one round of
              independence-move draws fixes n_eff),
  D sample    FlowMh with amortized global moves (global_every) and the
              fused local-RW chunk engine (samplers/flowmh_fused.py),
              run under the ON-DEVICE streaming-R̂ stop at 1.1,
  E validate  (untimed) further generations → cross-mode SPLIT R̂,
              per-mode occupancy weights vs the true ¼ each, posterior
              mean error. Validation draws are reduced on device; only
              scalars cross the tunnel.

Every timed phase is measured COLD (compile + run — the true cold-start
cost, reported as ``cold_total_s``) and WARM (cached executables — the
compile-excluded frame every other headline in this repo uses;
``northstar_wall_s`` = warm A + B + C is what BENCH_r04.json reports as
``wall_clock_to_crossmode_rhat_1p1_s``).

Honesty notes: the explore phase initializes chains stratified over the
KNOWN mode centres (the §2 recipe — overdispersion across the support
is what makes the final R̂ meaningful; the verdict endorses exactly this
composition). The stop R̂ is the streaming (non-split) statistic the
run_until machinery folds; phase D re-checks with the stricter SPLIT R̂
on a fresh window and the JSON carries both.

Writes benchmarks/northstar_config3.json (BENCH_SMOKE=1 → *_smoke.json,
tiny shapes, CPU-safe).
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
                                       gaussian_mixture,
                                       stratified_mode_init)
from bipymc_tpu.utils.diagnostics import mode_occupancy
from bipymc_tpu.utils.mixtures import fit_gmm, gmm_proposal

HERE = os.path.dirname(os.path.abspath(__file__))

D = 100
N_CHAINS = 256
EXPLORE_GENS, EXPLORE_BURN, EXPLORE_THIN = 1500, 500, 4
GMM_K, GMM_ITERS, GMM_MAX_PTS, GMM_RESTARTS = 8, 100, 50000, 4
LOCAL_MOVES, GLOBAL_EVERY, RW_SCALE = 2, 10, 0.2
# tail-domination safeguard for the independence proposal (see
# gmm_proposal docstring): without it, ML-fit tails are thinner than π
# and chains stick where π/q blows up — measured occupancy skew 0.18
# at d=100 with per-move acceptance 0.69 and cross-mode R̂ 1.01.
INFLATE = 1.05
# the bridge runs MORE frequent global moves (every 5 gens) over a longer
# window: its job is to hand the refit decorrelated draws, and the refit's
# acceptance is set by n_eff (diag-GMM estimation error ~ K·d/(2·n_eff) in
# the exp(−KL) exponent). 500 gens / global_every=10 gave refit acc 0.42
# and mode-weight error 0.058; the fused engine makes the longer bridge
# nearly free (~0.1 s warm per 1000 gens).
#
# TWO bridge→refit iterates (measured necessity, not taste): the first
# bridge runs under the exploration fit (acc ~0.1/move), so its draw set's
# MODE PROPORTIONS are still ~frozen at the explore occupancy — the first
# refit inherits mis-estimated component weights, and a proposal that
# under-proposes a mode makes that mode's occupancy mix on the slow
# 1/(w_q·acc) clock (run with one iterate: final weight error 0.11 with
# per-move acceptance 0.55 — per-dim R̂ converges, weights don't). The
# second bridge runs at ~0.5+/move, equilibrates proportions in a few
# hundred generations, and its refit pins the weights.
BRIDGE_GENS, BRIDGE_GLOBAL_EVERY, BRIDGE_ITERS = 2000, 5, 2
UNTIL_KW = dict(rhat_tol=1.1, chunk=200, max_chunks=200, warmup_chunks=1)
VALIDATE_GENS = 2000
SEED = 11

# NORTHSTAR_FUSED=0: run every FlowMh stage on the per-generation engine
# (engine-bias A/B diagnostic; same streams by key discipline)
FUSED = os.environ.get("NORTHSTAR_FUSED", "1") == "1"
SMOKE = os.environ.get("BENCH_SMOKE") == "1"
if SMOKE:
    D, N_CHAINS = 8, 64
    EXPLORE_GENS, EXPLORE_BURN, EXPLORE_THIN = 300, 100, 2
    GMM_K, GMM_ITERS, GMM_MAX_PTS = 6, 40, 10000
    BRIDGE_GENS, BRIDGE_GLOBAL_EVERY, BRIDGE_ITERS = 400, 5, 2
    UNTIL_KW = dict(rhat_tol=1.1, chunk=50, max_chunks=60, warmup_chunks=1)
    VALIDATE_GENS = 400


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _explore_draws(s):
    """Thinned post-burn-in explore history, flattened, DEVICE-resident."""
    xh = jnp.concatenate([c["x"] for c in s._chunks], axis=0)  # [T, n, d]
    return xh[EXPLORE_BURN // EXPLORE_THIN:].reshape(-1, xh.shape[-1])


def pipeline():
    """Run the full cold+warm protocol; return the result dict."""
    log("devices:", jax.devices())
    np.asarray(jnp.ones(()))                      # tunnel warmup
    on_tpu = jax.default_backend() == "tpu"

    means = baseline_config3_means(D)
    means_j = jnp.asarray(means)
    log_prob = gaussian_mixture(means, sigma=1.0)
    x0 = stratified_mode_init(jax.random.key(SEED), means_j, N_CHAINS,
                              var=4.0)

    out = {"config": {
        "d": D, "n_chains": N_CHAINS,
        "explore": {"gens": EXPLORE_GENS, "burn": EXPLORE_BURN,
                    "thin": EXPLORE_THIN},
        "gmm": {"K": GMM_K, "iters": GMM_ITERS, "max_points": GMM_MAX_PTS,
                "restarts": GMM_RESTARTS, "cov_type": "diag"},
        "flowmh": {"local_moves": LOCAL_MOVES, "global_every": GLOBAL_EVERY,
                   "rw_scale": RW_SCALE, "fused": True},
        "until": UNTIL_KW, "seed": SEED,
    }}

    # ---- A: explore -----------------------------------------------------
    explore = bp.DreamZs(log_prob, n_chains=N_CHAINS, seed=SEED,
                         burnin_gens=EXPLORE_BURN, fused=True,
                         fused_rng="kernel" if on_tpu else "stream")
    t0 = time.time()
    explore.run_mcmc(EXPLORE_GENS, x0, thin=EXPLORE_THIN)
    draws = jax.block_until_ready(_explore_draws(explore))
    t_explore_cold = time.time() - t0
    log(f"A explore cold: {t_explore_cold:.2f}s, draws {draws.shape}")

    # ---- B: fit (jitted; static shapes from the explore history) -------
    @jax.jit
    def _fit(k, dr):
        return fit_gmm(k, dr, GMM_K, n_iters=GMM_ITERS,
                       max_points=GMM_MAX_PTS, n_restarts=GMM_RESTARTS,
                       cov_type="diag")

    t0 = time.time()
    gparams, ginfo = jax.block_until_ready(_fit(jax.random.key(SEED + 1),
                                                draws))
    t_fit_cold = time.time() - t0
    log(f"B fit cold: {t_fit_cold:.2f}s, "
        f"loglik {float(ginfo['final_loglik']):.2f}")
    out["gmm_final_loglik"] = round(float(ginfo["final_loglik"]), 3)

    # ---- C: bridge→refit iterates --------------------------------------
    @jax.jit
    def _refit(k, dr):
        return fit_gmm(k, dr, GMM_K, n_iters=GMM_ITERS,
                       max_points=GMM_MAX_PTS, n_restarts=GMM_RESTARTS,
                       cov_type="diag")

    theta_b = explore.final_state.x
    params_i = gparams
    bridges, accs_b, bridge_starts = [], [], []
    t_bridge_cold = t_refit_cold = 0.0
    for i in range(BRIDGE_ITERS):
        bridge_starts.append(theta_b)
        b = bp.FlowMh(log_prob, gmm_proposal(params_i, INFLATE),
                      n_chains=N_CHAINS, seed=SEED + 2 + 10 * i,
                      local_moves=LOCAL_MOVES,
                      global_every=BRIDGE_GLOBAL_EVERY,
                      rw_scale=RW_SCALE, fused=FUSED)
        t0 = time.time()
        b.run_mcmc(BRIDGE_GENS, theta_b)
        xb = b._chunks[-1]["x"]                           # [T, n, d] device
        bdraws = jax.block_until_ready(
            xb[BRIDGE_GENS // 2:].reshape(-1, D))
        t_bridge_cold += time.time() - t0
        acc_i = (float(b.global_acceptance_fraction.mean())
                 * BRIDGE_GLOBAL_EVERY)
        accs_b.append(round(acc_i, 4))
        t0 = time.time()
        params_i, ginfo_i = jax.block_until_ready(
            _refit(jax.random.key(SEED + 3 + 10 * i), bdraws))
        t_refit_cold += time.time() - t0
        log(f"C bridge {i + 1}/{BRIDGE_ITERS} cold: acc/move {acc_i:.3f}, "
            f"refit loglik {float(ginfo_i['final_loglik']):.2f}")
        theta_b = b.final_state.x
        bridges.append(b)
    gparams2 = params_i
    log(f"C totals cold: bridge {t_bridge_cold:.2f}s, "
        f"refit {t_refit_cold:.2f}s")
    if os.environ.get("NORTHSTAR_SAVE_PARAMS"):
        np.savez(os.environ["NORTHSTAR_SAVE_PARAMS"],
                 log_w1=np.asarray(gparams.log_w),
                 mu1=np.asarray(gparams.mu),
                 chol1=np.asarray(gparams.chol),
                 log_w2=np.asarray(gparams2.log_w),
                 mu2=np.asarray(gparams2.mu),
                 chol2=np.asarray(gparams2.chol))

    # ---- D: sample until cross-mode R̂ < 1.1 ----------------------------
    s = bp.FlowMh(log_prob, gmm_proposal(gparams2, INFLATE), n_chains=N_CHAINS,
                  seed=SEED + 4, local_moves=LOCAL_MOVES,
                  global_every=GLOBAL_EVERY, rw_scale=RW_SCALE, fused=FUSED)
    t0 = time.time()
    info = s.run_mcmc_until(theta_b, **UNTIL_KW)
    t_until_cold = time.time() - t0
    stop_rhat = float(np.max(info["rhat"]))
    stop_gens = int(info["steps"])
    converged = stop_rhat < UNTIL_KW["rhat_tol"]
    log(f"D sample cold: {t_until_cold:.2f}s, {stop_gens} gens, "
        f"streaming R̂ {stop_rhat:.4f} (converged={converged})")

    # ---- E: validate (untimed) -----------------------------------------
    s.run_mcmc(VALIDATE_GENS)
    xh = s._chunks[-1]["x"]                               # [T, n, d] device
    occ_t = jax.vmap(lambda xt: mode_occupancy(xt, means_j))(xh)
    w = occ_t.sum(axis=0) / occ_t.sum()
    w_err = float(jnp.max(jnp.abs(w - 1.0 / means.shape[0])))
    window = jnp.swapaxes(xh, 0, 1)                       # [n, T, d]
    rhat_split = float(jnp.max(bp.gelman_rubin(window)))
    mean_err = float(jnp.max(jnp.abs(
        window.mean(axis=(0, 1)) - means_j.mean(axis=0))))
    acc_g = float(s.global_acceptance_fraction.mean()) * GLOBAL_EVERY
    log(f"E validate: split R̂ {rhat_split:.4f}, mode weights "
        f"{np.round(np.asarray(w), 3).tolist()} (err {w_err:.3f}), "
        f"mean err {mean_err:.3f}, global acc/move {acc_g:.3f}")

    # -- mixing forensics (all device-reduced; scalars fetched) ----------
    # per-chain accepted-global-move counts: a stuck-chain failure mode
    # shows as a mass of zeros here while the MEAN acceptance looks fine
    acch = s._chunks[-1]["accepted"]                      # [T, n] device
    acc_per_chain = jnp.sum(acch.astype(jnp.int32), axis=0)
    n_stuck = int(jnp.sum(acc_per_chain == 0))
    acc_q = np.asarray(jnp.percentile(
        acc_per_chain.astype(jnp.float32),
        jnp.asarray([0.0, 10.0, 50.0, 90.0])))
    # per-mode acceptance: which basin rejects its global moves
    mode_of = jax.vmap(lambda xt: jnp.argmin(jnp.sum(
        (xt[:, None, :] - means_j[None, :, :]) ** 2, axis=-1), axis=-1))(xh)
    per_mode_acc = np.asarray(jax.vmap(
        lambda m: (jnp.sum(jnp.where(mode_of == m, acch, 0))
                   / jnp.maximum(jnp.sum(jnp.where(mode_of == m,
                                                   acch * 0 + 1, 0)), 1)
                   ))(jnp.arange(means.shape[0]))) * GLOBAL_EVERY
    # the final fit's component weights and their mode assignment
    comp_mode = np.asarray(jnp.argmin(jnp.sum(
        (gparams2.mu[:, None, :] - means_j[None, :, :]) ** 2, axis=-1),
        axis=-1))
    comp_w = np.asarray(jnp.exp(gparams2.log_w))
    q_mode_w = np.zeros(means.shape[0])
    for c, m in enumerate(comp_mode):
        q_mode_w[m] += comp_w[c]
    log(f"E forensics: stuck chains (0 accepted) {n_stuck}/{N_CHAINS}; "
        f"accepted/chain pcts [min,10,50,90] {acc_q.round(1).tolist()}; "
        f"per-mode acc/move {np.round(per_mode_acc, 3).tolist()}; "
        f"q mass per mode {np.round(q_mode_w, 3).tolist()}")
    out["forensics"] = {
        "stuck_chains": n_stuck,
        "accepted_per_chain_pcts": acc_q.round(2).tolist(),
        "per_mode_acceptance_per_move": np.round(per_mode_acc, 4).tolist(),
        "q_mass_per_mode": np.round(q_mode_w, 4).tolist(),
    }

    # ---- warm pass (cached executables) --------------------------------
    explore.reset()
    t0 = time.time()
    explore.run_mcmc(EXPLORE_GENS, x0, thin=EXPLORE_THIN)
    draws_w = jax.block_until_ready(_explore_draws(explore))
    t_explore_warm = time.time() - t0

    t0 = time.time()
    jax.block_until_ready(_fit(jax.random.key(SEED + 1), draws_w))
    t_fit_warm = time.time() - t0

    t_bridge_warm = t_refit_warm = 0.0
    for i, b in enumerate(bridges):
        b.reset()
        t0 = time.time()
        b.run_mcmc(BRIDGE_GENS, bridge_starts[i])
        bdraws_w = jax.block_until_ready(
            b._chunks[-1]["x"][BRIDGE_GENS // 2:].reshape(-1, D))
        t_bridge_warm += time.time() - t0
        t0 = time.time()
        jax.block_until_ready(
            _refit(jax.random.key(SEED + 3 + 10 * i), bdraws_w))
        t_refit_warm += time.time() - t0

    s.reset()
    t0 = time.time()
    info_w = s.run_mcmc_until(theta_b, **UNTIL_KW)
    t_until_warm = time.time() - t0
    stop_rhat_w = float(np.max(info_w["rhat"]))
    log(f"warm: explore {t_explore_warm:.2f}s, fit {t_fit_warm:.2f}s, "
        f"bridge {t_bridge_warm:.2f}s, refit {t_refit_warm:.2f}s, "
        f"sample {t_until_warm:.2f}s (R̂ {stop_rhat_w:.4f})")

    warm_total = (t_explore_warm + t_fit_warm + t_bridge_warm
                  + t_refit_warm + t_until_warm)
    cold_total = (t_explore_cold + t_fit_cold + t_bridge_cold
                  + t_refit_cold + t_until_cold)
    out.update({
        "cold_s": {"explore": round(t_explore_cold, 3),
                   "fit": round(t_fit_cold, 3),
                   "bridge": round(t_bridge_cold, 3),
                   "refit": round(t_refit_cold, 3),
                   "sample_until": round(t_until_cold, 3)},
        "warm_s": {"explore": round(t_explore_warm, 3),
                   "fit": round(t_fit_warm, 3),
                   "bridge": round(t_bridge_warm, 3),
                   "refit": round(t_refit_warm, 3),
                   "sample_until": round(t_until_warm, 3)},
        "cold_total_s": round(cold_total, 3),
        "northstar_wall_s": round(warm_total, 3),
        "stop_gens": stop_gens,
        "stop_rhat_streaming": round(stop_rhat, 4),
        "stop_rhat_streaming_warm": round(stop_rhat_w, 4),
        "converged": bool(converged),
        "bridge_global_acceptance_per_move": accs_b,
        "validate": {
            "gens": VALIDATE_GENS,
            "crossmode_split_rhat": round(rhat_split, 4),
            "mode_weights": np.round(np.asarray(w), 4).tolist(),
            "mode_weight_abs_err": round(w_err, 4),
            "posterior_mean_abs_err": round(mean_err, 4),
            "global_acceptance_per_move": round(acc_g, 4),
        },
    })
    if SMOKE:
        out["smoke"] = True
    return out


def main():
    out = pipeline()
    path = os.path.join(HERE, "northstar_config3.json")
    if SMOKE:
        path = path.replace(".json", "_smoke.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({
        "northstar_wall_s": out["northstar_wall_s"],
        "cold_total_s": out["cold_total_s"],
        "stop_rhat": out["stop_rhat_streaming"],
        "crossmode_split_rhat": out["validate"]["crossmode_split_rhat"],
        "mode_weight_abs_err": out["validate"]["mode_weight_abs_err"],
        "converged": out["converged"],
    }))


if __name__ == "__main__":
    main()
