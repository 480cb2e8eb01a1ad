#!/usr/bin/env python
"""Nested sampling on the headline target: evidence + mode weights.

The third evidence engine (docs/ROUND3.md §39) measured on the exact
BASELINE config-3 posterior (100-d 4-mode mixture,
`baseline_config3_means`) that §2/§21 established as the honesty
benchmark: untempered MCMC cannot self-mix its mode weights, SMC can
but needs the reference-breadth rule (profile_smc.py) — nested
sampling needs NO reference density and no breadth tuning, because the
prior (a uniform cube that covers the support, the only choice to
make) is shrunk through every basin simultaneously.

Checked quantities, same contract as profile_smc.py:
- **log evidence**: the mixture density is fully normalised, so over a
  cube [-C, C]^d the true value is logZ = −d·log(2C) (the Gaussian
  mass outside the cube is negligible at C=20, |μ|≲15, σ=1); the
  estimator must land within ~3 of its own √(H/K) error bar.
- **mode occupancy of the resampled posterior draws** vs [N/4]×4 —
  reached from a likelihood-blind uniform init, no stratified starts,
  no mode knowledge anywhere.

Methodology (§18): the whole run is one while_loop program — one full
run compiles + runs, a re-seeded second sampler shares the compiled
runner and is timed with a value-fetch barrier.

Writes benchmarks/ns_headline.json and prints a markdown row.
"""

import json
import math
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
from bipymc_tpu.models.targets import baseline_config3_means, gaussian_mixture
from bipymc_tpu.utils.diagnostics import mode_occupancy

HERE = os.path.dirname(os.path.abspath(__file__))
D = 100
N_LIVE = int(os.environ.get("NS_LIVE", 4096))
N_BATCH = int(os.environ.get("NS_BATCH", 256))
# slice direction-updates: ≈ d is enough at d=8, but direction COVERAGE
# of the basin is coupon-collector in d — the first d=100 run at
# n_mcmc=100 measured logZ +10 nats high with one basin extinct
# (§39 addendum); ≳3d is where the bias enters the error bar
N_MCMC = int(os.environ.get("NS_MCMC", 300))
MAX_BATCHES = 4500
KERNEL = "slice"
CUBE = 20.0                  # prior cube [-20, 20]^d covers |μ| ≲ 15
SPREAD = 5.0
SMOKE = os.environ.get("BENCH_SMOKE") == "1"
if SMOKE:
    D, N_LIVE, N_BATCH, N_MCMC, MAX_BATCHES = 8, 256, 32, 10, 400


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    log("devices:", jax.devices())
    np.asarray(jnp.ones(()))

    means = baseline_config3_means(D, spread=SPREAD)
    log_like = gaussian_mixture(means, sigma=1.0)
    true_logz = -D * math.log(2.0 * CUBE)

    def prior_transform(u):
        return 2.0 * CUBE * u - CUBE

    def build(seed):
        return bp.NestedSampler(log_like, prior_transform, D,
                                n_live=N_LIVE, n_batch=N_BATCH,
                                n_mcmc=N_MCMC, max_batches=MAX_BATCHES,
                                kernel=KERNEL, seed=seed)

    s0 = build(0)
    t0 = time.time()
    info0 = s0.run()                        # compile + first run
    np.asarray(s0.log_evidence)
    log(f"compile + run: {time.time() - t0:.1f}s, "
        f"{info0['n_batches']} batches, logZ {info0['log_evidence']:.2f}")

    s1 = build(1)
    s1._runner = s0._runner                 # shared compiled runner
    t0 = time.time()
    info = s1.run()
    np.asarray(s1.log_evidence)             # value-fetch barrier (§18)
    wall = time.time() - t0

    draws = s1.resample(N_LIVE)
    occ = np.asarray(mode_occupancy(jnp.asarray(draws),
                                    jnp.asarray(means)))
    n_modes = occ.size
    dz = float(info["log_evidence"] - true_logz)
    out = {
        "config": {"d": D, "n_live": N_LIVE, "n_batch": N_BATCH,
                   "n_mcmc": N_MCMC, "kernel": KERNEL,
                   "cube_half_side": CUBE},
        "wall_s": round(wall, 3),
        "n_batches": info["n_batches"],
        "n_like_evals": info["n_like_evals"],
        "like_evals_per_sec": round(info["n_like_evals"] / wall, 1),
        "terminated": info["terminated"],
        "log_evidence": round(float(info["log_evidence"]), 3),
        "log_evidence_err": round(float(info["log_evidence_err"]), 3),
        "log_evidence_true": round(true_logz, 3),
        "log_evidence_error": round(dz, 3),
        "information_H": round(float(info["information"]), 2),
        "mode_occupancy": occ.tolist(),
        "mode_occupancy_true": [N_LIVE // n_modes] * n_modes,
        "walk_acceptance_mean": round(float(info["acceptance"].mean()), 3),
    }
    if SMOKE:
        out["smoke"] = True
    path = os.path.join(HERE, "ns_headline.json")
    if SMOKE:
        path = path.replace(".json", "_smoke.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("| batches | wall (s) | log Ẑ ± err | analytic | occupancy "
          f"(true {N_LIVE // n_modes}/mode) | acc |")
    print("|---|---|---|---|---|---|")
    print(f"| {out['n_batches']} | {out['wall_s']} | "
          f"{out['log_evidence']} ± {out['log_evidence_err']} | "
          f"{out['log_evidence_true']} | {out['mode_occupancy']} | "
          f"{out['walk_acceptance_mean']} |")
    if not out["terminated"]:
        log("WARNING: hit max_batches before stop_dlogz")


if __name__ == "__main__":
    main()
