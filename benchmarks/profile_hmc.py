#!/usr/bin/env python
"""HMC vs DRAM statistical throughput on hardware (ROUND3 §19).

The gradient family's pitch is ESS/sec, not raw step rate: each HMC
generation costs L leapfrog target+grad evals but decorrelates in O(1)
generations where a random-walk needs O(condition) steps. Measured on a
d=100 Gaussian with scales log-spaced 1..10 (condition number 100 —
mild; within-basin headline-like shape), 256 chains each arm:

- HMC: n_leapfrog=16, jittered, dual-averaged ε, adapted diagonal mass.
- DRAM: vmapped, adapted covariance (the reference's workhorse).

Both arms: warm/adapt phase first (compile + adaptation frozen), then
timed chunks with async dispatch and a value-fetch barrier (§18), ESS
via the same windowed estimator bench.py uses.

Writes benchmarks/hmc_ab.json and prints a markdown table.
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bipymc_tpu.samplers import hmc, rw
from bipymc_tpu.core.scan import run_scan_thinned
from bipymc_tpu.utils.diagnostics import ess_rate

HERE = os.path.dirname(os.path.abspath(__file__))
D = 100
N_CHAINS = 256
WARM_GENS = 1000          # covers adapt_gens for both arms
CHUNK = 1000
CHUNKS = 4
SMOKE = os.environ.get("BENCH_SMOKE") == "1"
if SMOKE:
    D, N_CHAINS, WARM_GENS, CHUNK, CHUNKS = 8, 16, 60, 50, 2

SCALES = np.logspace(0, 1, D).astype(np.float32)      # 1..10
INV_VAR = jnp.asarray(1.0 / SCALES ** 2)


def log_prob(theta):
    return -0.5 * jnp.sum(theta * theta * INV_VAR)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_arm(name, state, runner, k_run):
    # warm: compile + adaptation (adaptation gates on t, frozen by WARM)
    t0 = time.time()
    state, h = runner(state, jax.random.fold_in(k_run, 0), jnp.int32(0))
    np.asarray(jax.tree_util.tree_leaves(h)[0][-1, 0])   # value barrier
    log(f"{name}: compile + {WARM_GENS} warm/adapt gens "
        f"{time.time() - t0:.1f}s")
    # timed: async chunks, value-fetch barrier at the end (§18)
    hists, extras = [], []
    t0 = time.time()
    for c in range(CHUNKS):
        state, h = runner(state, jax.random.fold_in(k_run, 1 + c),
                          jnp.int32(WARM_GENS + c * CHUNK))
        hists.append(h["x"])
        if "nlf" in h:
            extras.append(h["nlf"])
    jax.block_until_ready(hists)
    np.asarray(hists[-1][-1, 0])
    dt = time.time() - t0
    n_gens = CHUNKS * CHUNK
    chains = np.swapaxes(
        np.concatenate([np.asarray(x) for x in hists], axis=0), 0, 1)
    gps = n_gens / dt
    ess, eps = ess_rate(chains, gps)
    log(f"{name}: {gps:,.0f} gens/s, ESS {ess:,.0f}, {eps:,.0f} ESS/s")
    out = {"gens_per_sec": gps, "ess": float(ess), "ess_per_sec": eps,
           "us_per_gen": 1e6 * dt / n_gens}
    if extras:
        nlf = np.concatenate([np.asarray(e) for e in extras], axis=0)
        # per-generation device cost tracks the batch MAX (lockstep
        # while_loop); the mean is the statistical work per chain
        out["leapfrog_mean"] = float(nlf.mean())
        out["leapfrog_batch_max_mean"] = float(nlf.max(axis=1).mean())
        log(f"{name}: leapfrog/gen mean {out['leapfrog_mean']:.1f}, "
            f"batch-max mean {out['leapfrog_batch_max_mean']:.1f}")
    return out


def run_hmc(seed=0):
    cfg = hmc.HmcConfig(n_leapfrog=16, adapt_gens=800 if not SMOKE else 40,
                        mass_interval=100, t0_mass=100)
    kx, kr = jax.random.split(jax.random.key(seed))
    x0 = jax.random.normal(kx, (N_CHAINS, D)) * jnp.asarray(SCALES)
    state = hmc.init(x0, log_prob, cfg)
    step = hmc.make_step(log_prob, cfg)
    collect = lambda s, i: {"x": s.x}
    runners = {}

    def runner(s, key, t):
        n = WARM_GENS if int(t) == 0 else CHUNK
        if n not in runners:
            runners[n] = jax.jit(lambda s_, k_, t_, _n=n: run_scan_thinned(
                step, s_, k_, _n, thin=1, collect_fn=collect, t0=t_))
        return runners[n](s, key, t)

    return run_arm("hmc", state, runner, kr)


def run_nuts(seed=0):
    from bipymc_tpu.samplers import nuts
    cfg = nuts.NutsConfig(max_depth=7,
                          adapt_gens=800 if not SMOKE else 40,
                          mass_interval=100, t0_mass=100)
    kx, kr = jax.random.split(jax.random.key(seed))
    x0 = jax.random.normal(kx, (N_CHAINS, D)) * jnp.asarray(SCALES)
    state = nuts.init(x0, log_prob, cfg)
    step = nuts.make_step(log_prob, cfg)
    # record per-generation leapfrog counts: NUTS's cost is
    # data-dependent (max tree across the batch per while_loop), so
    # µs/gen alone under-describes the arm
    collect = lambda s, i: {"x": s.x, "nlf": i.n_leapfrog}
    runners = {}

    def runner(s, key, t):
        n = WARM_GENS if int(t) == 0 else CHUNK
        if n not in runners:
            runners[n] = jax.jit(lambda s_, k_, t_, _n=n: run_scan_thinned(
                step, s_, k_, _n, thin=1, collect_fn=collect, t0=t_))
        return runners[n](s, key, t)

    return run_arm("nuts", state, runner, kr)


def run_chees(seed=0):
    from bipymc_tpu.samplers import chees
    cfg = chees.chees_config(adapt_gens=800 if not SMOKE else 40,
                             mass_interval=100, t0_mass=100,
                             max_leapfrog=128)
    kx, kr = jax.random.split(jax.random.key(seed))
    x0 = jax.random.normal(kx, (N_CHAINS, D)) * jnp.asarray(SCALES)
    state = chees.init(x0, log_prob, cfg)
    step = chees.make_step(log_prob, cfg)
    # L_t is one shared scalar per generation (the whole point);
    # broadcast so run_arm's per-chain accounting applies unchanged —
    # mean == batch-max by construction
    collect = lambda s, i: {
        "x": s.x,
        "nlf": jnp.broadcast_to(i.n_leapfrog, (s.x.shape[0],))}
    runners = {}

    def runner(s, key, t):
        n = WARM_GENS if int(t) == 0 else CHUNK
        if n not in runners:
            runners[n] = jax.jit(lambda s_, k_, t_, _n=n: run_scan_thinned(
                step, s_, k_, _n, thin=1, collect_fn=collect, t0=t_))
        return runners[n](s, key, t)

    return run_arm("chees", state, runner, kr)


def run_dram(seed=0):
    cfg = rw.dram_config(t0=200, adapt_interval=50)
    kx, kr = jax.random.split(jax.random.key(seed))
    x0 = jax.random.normal(kx, (N_CHAINS, D)) * jnp.asarray(SCALES)
    cov0 = jnp.diag(jnp.asarray(SCALES ** 2)) * (2.38 ** 2 / D)
    state = jax.vmap(lambda t: rw.init(t, log_prob, cov0))(x0)
    step = rw.make_step(log_prob, cfg)
    ids = jnp.arange(N_CHAINS)

    def batched(s, k, t):
        ks = jax.vmap(lambda i: jax.random.fold_in(k, i))(ids)
        return jax.vmap(step, in_axes=(0, 0, None))(s, ks, t)

    collect = lambda s, i: {"x": s.theta}
    runners = {}

    def runner(s, key, t):
        n = WARM_GENS if int(t) == 0 else CHUNK
        if n not in runners:
            runners[n] = jax.jit(lambda s_, k_, t_, _n=n: run_scan_thinned(
                batched, s_, k_, _n, thin=1, collect_fn=collect, t0=t_))
        return runners[n](s, key, t)

    return run_arm("dram", state, runner, kr)


def main():
    log("devices:", jax.devices())
    np.asarray(jnp.ones(()))
    out = {"config": {"d": D, "n_chains": N_CHAINS, "target":
                      "gaussian scales 1..10 (cond 100)",
                      "timed_gens": CHUNKS * CHUNK},
           "hmc": run_hmc(), "nuts": run_nuts(), "chees": run_chees(),
           "dram": run_dram()}
    out["ess_per_sec_ratio_hmc_over_dram"] = round(
        out["hmc"]["ess_per_sec"] / out["dram"]["ess_per_sec"], 2)
    out["ess_per_sec_ratio_nuts_over_dram"] = round(
        out["nuts"]["ess_per_sec"] / out["dram"]["ess_per_sec"], 2)
    out["ess_per_sec_ratio_chees_over_nuts"] = round(
        out["chees"]["ess_per_sec"] / out["nuts"]["ess_per_sec"], 2)
    path = os.path.join(HERE, "hmc_ab.json")
    if SMOKE:
        path = path.replace(".json", "_smoke.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("| arm | gens/s | µs/gen | ESS (window) | ESS/s |")
    print("|---|---|---|---|---|")
    for arm in ("hmc", "nuts", "chees", "dram"):
        r = out[arm]
        print(f"| {arm} | {r['gens_per_sec']:,.0f} | "
              f"{r['us_per_gen']:.1f} | {r['ess']:,.0f} | "
              f"{r['ess_per_sec']:,.0f} |")
    print(f"\nESS/s ratio (hmc/dram): "
          f"{out['ess_per_sec_ratio_hmc_over_dram']}, (nuts/dram): "
          f"{out['ess_per_sec_ratio_nuts_over_dram']}, (chees/nuts): "
          f"{out['ess_per_sec_ratio_chees_over_nuts']}")


if __name__ == "__main__":
    main()
