#!/usr/bin/env python
"""SMC discovery-phase tuning probe — round-5 headline optimization.

The oracle-free north star's warm wall (~2.8 s) is dominated by the SMC
discovery phase (~2.0 s at the conservative profile_smc.py settings:
16,384 particles, ess_alpha=0.95, n_moves=5). Discovery needs less than
the evidence benchmark does — the GMM fit + bridge/refit downstream
only require every basin REPRESENTED with weights within ~0.05 (the
bridge equilibrates proportions at 0.5+ acc/move in a few hundred
gens). This probe sweeps (particles, ess_alpha, n_moves) and reports
warm wall, stages, logZ and resampled-mode occupancy; the winner
becomes the harness's discovery config, the conservative one stays for
evidence work.

Writes benchmarks/smc_discovery_ab.json (BENCH_SMOKE=1 → *_smoke).
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

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import bipymc_tpu as bp
from bipymc_tpu.models.targets import baseline_config3_means, gaussian_mixture
from bipymc_tpu.utils.diagnostics import mode_occupancy

D = 100
SPREAD = 5.0
REF_VAR = 10.0 * SPREAD ** 2
SMOKE = os.environ.get("BENCH_SMOKE") == "1"
if SMOKE:
    D = 8

ARMS = [
    # (particles, ess_alpha, n_moves)  — first row = round-4 conservative
    (16384, 0.95, 5),
    (16384, 0.90, 3),
    (8192, 0.95, 5),
    (8192, 0.90, 3),
    (8192, 0.90, 2),
    (4096, 0.90, 3),
]
if SMOKE:
    ARMS = [(512, 0.95, 3), (256, 0.90, 2)]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    log("devices:", jax.devices())
    np.asarray(jnp.ones(()))

    means = baseline_config3_means(D, spread=SPREAD)
    means_j = jnp.asarray(means)
    log_prob = gaussian_mixture(means, sigma=1.0)
    k = means.shape[0]

    out = {"config": {"d": D, "ref_var": REF_VAR}, "arms": []}
    for (n_p, alpha, n_moves) in ARMS:
        def build(seed):
            return bp.Smc(log_prob, n_particles=n_p, seed=seed,
                          ref_mean=np.zeros(D, np.float32),
                          ref_var=np.full(D, REF_VAR, np.float32),
                          ess_alpha=alpha, n_moves=n_moves,
                          kernel="hmc", max_stages=600)

        s0 = build(0)
        t0 = time.time()
        info0 = s0.run()
        np.asarray(s0.particles[0, 0])
        t_cold = time.time() - t0
        s1 = build(1)
        s1._runner = s0._runner
        t0 = time.time()
        info = s1.run()
        np.asarray(s1.particles[0, 0])
        wall = time.time() - t0
        draws = s1.resample()
        occ = np.asarray(mode_occupancy(jnp.asarray(draws), means_j))
        w = occ / occ.sum()
        w_err = float(np.max(np.abs(w - 1.0 / k)))
        row = {"particles": n_p, "ess_alpha": alpha, "n_moves": n_moves,
               "warm_s": round(wall, 3), "cold_s": round(t_cold, 2),
               "stages": int(info["n_stages"]),
               "log_evidence": round(float(info["log_evidence"]), 4),
               "mode_weights": np.round(w, 4).tolist(),
               "mode_weight_abs_err": round(w_err, 4),
               "all_modes_alive": bool(np.all(occ > 0))}
        out["arms"].append(row)
        log(f"  N={n_p:6d} a={alpha} moves={n_moves}: warm {wall:.2f}s "
            f"({int(info['n_stages'])} stages), logZ "
            f"{float(info['log_evidence']):+.3f}, w_err {w_err:.4f}")

    path = os.path.join(HERE, "smc_discovery_ab.json")
    if SMOKE:
        out["smoke"] = True
        path = path.replace(".json", "_smoke.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log("wrote", path)
    print(json.dumps(out["arms"]))


if __name__ == "__main__":
    main()
