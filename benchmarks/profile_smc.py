#!/usr/bin/env python
"""SMC on the headline target: evidence + mode occupancy from annealing.

BASELINE config 3's 100-d 4-mode mixture is the target the round-2/3
honesty work (docs/ROUND3.md §2) showed no untempered MCMC sampler can
self-mix on: mode weights are frozen at the init and there is no
evidence estimate. This harness runs `bp.Smc(kernel="hmc")` on that
exact target (same `baseline_config3_means` the bench uses) and checks
the two quantities only SMC delivers:

- **log evidence** vs the analytic value 0 (`gaussian_mixture` builds a
  fully normalised density — weights and per-component constants both
  included — so the estimator's entire output IS its error);
- **mode occupancy of the resampled posterior draws** vs the true
  [N/4]×4 — reached from a UNIMODAL reference at the origin, no
  stratified init, no mode knowledge.

**The reference-breadth rule (measured).** A reference that merely
*covers* the modes is not enough here: config 3's modes sit at
different radii |μ_k| from the origin, and along the geometric path the
ref^(1−β) factor weights basin k by exp(−(1−β)|μ_k|²/2v) — with
v = spread²+1 = 26 the mid-β imbalance between modes is ~7 nats, the
far basins' equilibrium share drops below 1/N, and they go EXTINCT:
measured occupancy [0, 0, 4096, 0] with log Ẑ = −1.341 ≈ ln(1/4) (the
estimator exactly reporting the lost 3 of 4 basins — the evidence
doubles as a mode-loss diagnostic). The cure is in the same formula:
v = 250 ≈ 10·spread² caps the imbalance at ~0.7 nats, and every basin
survives (ess_alpha=0.95 tightens the schedule for the wider path).
This is a property of ANY geometric-path method on radius-asymmetric
modes, not of this implementation — docs/ROUND3.md §21.

Timing follows §18: one full run to compile (the whole annealing pass is
a single while_loop program), then a re-seeded timed run bracketed by a
value fetch.

Writes benchmarks/smc_headline.json and prints a markdown row.
"""

import json
import os
import sys
import time

import numpy as np

if os.environ.get("JAX_PLATFORMS"):
    # axon sitecustomize pins the platform programmatically; honour an
    # explicit env override (CPU smoke runs) the way bench.py does
    import jax
    _plats = os.environ["JAX_PLATFORMS"]
    if "cpu" not in _plats.split(","):
        _plats += ",cpu"
    jax.config.update("jax_platforms", _plats)

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bipymc_tpu as bp
from bipymc_tpu.models.targets import baseline_config3_means, gaussian_mixture
from bipymc_tpu.utils.diagnostics import mode_occupancy

HERE = os.path.dirname(os.path.abspath(__file__))
D = 100
N_PARTICLES = 16384
SPREAD = 5.0
REF_VAR = 10.0 * SPREAD ** 2        # the breadth rule (docstring)
SMOKE = os.environ.get("BENCH_SMOKE") == "1"
if SMOKE:
    D, N_PARTICLES = 8, 256


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    log("devices:", jax.devices())
    np.asarray(jnp.ones(()))

    means = baseline_config3_means(D, spread=SPREAD)
    log_prob = gaussian_mixture(means, sigma=1.0)
    true_logz = 0.0              # the mixture density is fully normalised
    ref_var = np.full(D, REF_VAR, np.float32)

    def build(seed):
        return bp.Smc(log_prob, n_particles=N_PARTICLES, seed=seed,
                      ref_mean=np.zeros(D, np.float32), ref_var=ref_var,
                      ess_alpha=0.95, n_moves=5, kernel="hmc",
                      max_stages=600)

    s0 = build(0)
    t0 = time.time()
    info0 = s0.run()                       # compile + first run
    np.asarray(s0.particles[0, 0])
    log(f"compile + run: {time.time() - t0:.1f}s, "
        f"{info0['n_stages']} stages")

    s1 = build(1)
    s1._runner = s0._runner                # shared compiled runner
    t0 = time.time()
    info = s1.run()
    np.asarray(s1.particles[0, 0])         # value-fetch barrier (§18)
    wall = time.time() - t0

    draws = s1.resample()
    occ = np.asarray(mode_occupancy(jnp.asarray(draws),
                                    jnp.asarray(means)))
    n_modes = occ.size
    occ_frac = occ / occ.sum()
    logz_err = float(info["log_evidence"] - true_logz)
    out = {
        "config": {"d": D, "n_particles": N_PARTICLES,
                   "kernel": "hmc", "ess_alpha": 0.95, "n_moves": 5,
                   "ref_var": float(REF_VAR)},
        "wall_s": round(wall, 3),
        "n_stages": info["n_stages"],
        "reached_one": info["reached_one"],
        "log_evidence": round(float(info["log_evidence"]), 3),
        "log_evidence_true": round(float(true_logz), 3),
        "log_evidence_error": round(logz_err, 3),
        "mode_occupancy": occ.tolist(),
        "mode_occupancy_true": [N_PARTICLES // n_modes] * n_modes,
        "move_acceptance_mean": round(float(info["acceptance"].mean()), 3),
    }
    if SMOKE:
        out["smoke"] = True
    path = os.path.join(HERE, "smc_headline.json")
    if SMOKE:
        path = path.replace(".json", "_smoke.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("| stages | wall (s) | log Ẑ | analytic | occupancy (true "
          f"{N_PARTICLES // n_modes}/mode) | acc |")
    print("|---|---|---|---|---|---|")
    print(f"| {out['n_stages']} | {out['wall_s']} | "
          f"{out['log_evidence']} | {out['log_evidence_true']} | "
          f"{out['mode_occupancy']} | {out['move_acceptance_mean']} |")
    if not out["reached_one"]:
        print("WARNING: hit max_stages before beta=1")
    if max(abs(f - 1.0 / n_modes) for f in occ_frac) > 0.1:
        print("WARNING: occupancy off the equal-weight truth by >10%")


if __name__ == "__main__":
    main()
