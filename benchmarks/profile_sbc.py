#!/usr/bin/env python
"""SBC at production scale on the chip (utils/sbc.py, ROUND3.md §27).

A calibration study is embarrassingly parallel across replications, and
the harness compiles the whole K×(burn + M·thin)-step study into ONE
vmapped device program — so the chip turns what is normally an
overnight validation job into seconds. This harness runs the conjugate
normal-normal model at K = 4096 replications for DRAM and HMC, checks
rank uniformity, and records wall-clock + chain-step throughput
(compile excluded via a warm call on a different seed; value-fetch
barrier per docs/ROUND3.md §18).

Writes benchmarks/sbc_scale.json.
"""

import json
import os
import sys
import time

if os.environ.get("JAX_PLATFORMS"):
    import jax
    _plats = os.environ["JAX_PLATFORMS"]
    if "cpu" not in _plats.split(","):
        _plats += ",cpu"
    jax.config.update("jax_platforms", _plats)

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from bipymc_tpu.utils.sbc import sbc_ranks, sbc_uniformity  # noqa: E402

D = 4
SIGMA = 1.0
N_OBS = 3
K = 4096
M = 127


def prior_sample(key):
    return jax.random.normal(key, (D,))


def simulate(key, theta):
    return theta + SIGMA * jax.random.normal(key, (N_OBS, D))


def log_post(theta, y):
    return (-0.5 * jnp.sum(theta**2)
            - 0.5 * jnp.sum((y - theta) ** 2) / SIGMA**2)


def run_arm(sampler, **kw):
    steps_per_repl = kw["burn"] + M * kw["thin"]

    def study(seed):
        return sbc_ranks(prior_sample, simulate, log_post,
                         sampler=sampler, n_repl=K, n_draws=M,
                         seed=seed, **kw)

    t0 = time.time()
    _ = np.asarray(study(1))          # compile + warm (value fetch)
    compile_s = time.time() - t0
    t0 = time.time()
    ranks = np.asarray(study(0))      # timed, fresh seed, same executable
    wall = time.time() - t0
    stat, thresh = sbc_uniformity(ranks, n_bins=8, n_draws=M)
    total_steps = K * steps_per_repl
    print(f"{sampler}: K={K} x {steps_per_repl} steps in {wall:.2f}s "
          f"({total_steps / wall / 1e6:.1f}M chain-steps/s) "
          f"chi2 {np.round(stat, 1)} vs {thresh:.1f} "
          f"(compile+warm {compile_s:.1f}s)", file=sys.stderr)
    return {
        "sampler": sampler, "n_repl": K, "n_draws": M,
        "steps_per_replication": steps_per_repl,
        "wall_s": round(wall, 3),
        "chain_steps_per_sec": round(total_steps / wall),
        "compile_plus_warm_s": round(compile_s, 1),
        "chi2": [round(float(s), 2) for s in stat],
        "chi2_threshold": round(float(thresh), 2),
        "calibrated": bool(np.all(stat < thresh)),
    }


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    cov = (2.38**2 / D) * 0.25 * jnp.eye(D)
    results = {
        "dram": run_arm("dram", thin=8, burn=300, cov=cov),
        "hmc": run_arm("hmc", thin=2, burn=300, step_size=0.25,
                       n_leapfrog=8),
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "sbc_scale.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
