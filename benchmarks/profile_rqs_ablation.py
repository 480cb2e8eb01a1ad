#!/usr/bin/env python
"""RQS-vs-affine coupling ablation — round-5 verdict #7.

Round 4 measured the richer rational-quadratic-spline coupling LOSING
to plain affine on the d=16 / 4-mode IID-draw A/B (acceptance 0.27 vs
0.47, GMM 0.93) with no explanation — a red flag, since affine maps are
(pointwise) a special case of monotone splines and Durkan et al. 2019
report NSF > affine-coupling across their benchmarks. This harness
ablates the knobs that plausibly explain it:

- ``n_bins`` ∈ {4, 8, 12}       (spline resolution)
- ``tail_bound`` ∈ {3, 4, 6}    (active range in standardized units)
- ``hidden`` ∈ {64, 128}        (conditioner capacity — the RQS head is
                                 d·(3K−1) outputs vs affine's 2d, so at
                                 equal width each output gets ~11× less
                                 capacity at K=8)
- ``n_steps`` ∈ {2000, 6000} and a lower Adam lr (3e-4): the larger
  head may simply be undertrained at the shared budget.

Metric: the DIRECT independence-MH acceptance estimator — with x ~ π
(held-out IID draws) and y ~ q,

    acc = E[min(1, exp((ℓ(y) − log q(y)) − (ℓ(x) − log q(x))))]

which is exactly the stationary per-move acceptance of the FlowMh
global channel, without the MCMC noise of round 4's sampler-based
readout. ``final_nll`` (mean −log q on held-out draws) is reported
beside it: if acceptance tracks NLL across the ablation the gap is a
FIT problem (capacity/training), not a family problem.

Also re-probes the round-4 ``n_bins=12`` tunnel failure (UNAVAILABLE on
a single 4000-step scan) by running the same budget as 8 warm-started
500-step scans (``fit_flow(init_params=...)``, round-5 addition).

Writes benchmarks/rqs_ablation.json (BENCH_SMOKE=1 → *_smoke.json).
"""

import argparse
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

from bipymc_tpu.models.targets import baseline_config3_means, gaussian_mixture
from bipymc_tpu.utils.flows import (FlowConfig, fit_flow, flow_log_q,
                                    flow_sample)
from bipymc_tpu.utils.mixtures import fit_gmm, gmm_proposal

D = 16
N_TRAIN, N_EVAL = 20000, 4096
SEED = 4
SMOKE = os.environ.get("BENCH_SMOKE") == "1"
if SMOKE:
    D, N_TRAIN, N_EVAL = 4, 2000, 512


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", default=None,
                    help="run ONE arm and merge into the JSON (crash "
                         "isolation: the round-4/5 chip sessions saw "
                         "TPU-worker crashes inside RQS eval programs; "
                         "one process per arm keeps the sweep alive)")
    cli = ap.parse_args()
    log("devices:", jax.devices())
    np.asarray(jnp.ones(()))

    means = baseline_config3_means(D)
    means_j = jnp.asarray(means)
    k_modes = means.shape[0]
    lp = gaussian_mixture(means, sigma=1.0)
    lp_batch = jax.jit(jax.vmap(lp))

    rng = np.random.default_rng(SEED)
    which = rng.integers(0, k_modes, N_TRAIN + N_EVAL)
    draws = (means[which]
             + rng.standard_normal((N_TRAIN + N_EVAL, D))).astype(
                 np.float32)
    train = jnp.asarray(draws[:N_TRAIN])
    held = jnp.asarray(draws[N_TRAIN:])
    lp_held = lp_batch(held)

    def acceptance(log_q_fn, sample_fn):
        """Direct stationary independence-MH acceptance estimate."""
        y = sample_fn(jax.random.key(SEED + 1), N_EVAL)
        lq_y = log_q_fn(y)
        lp_y = lp_batch(y)
        lq_x = log_q_fn(held)
        # min(1, e^Δ) over independent (x, y) pairs
        delta = (lp_y - lq_y) - (lp_held - lq_x)
        return float(jnp.mean(jnp.minimum(1.0, jnp.exp(
            jnp.minimum(delta, 0.0) + 0.0)))), lq_x

    path = os.path.join(HERE, "rqs_ablation.json")
    if SMOKE:
        path = path.replace(".json", "_smoke.json")
    results = {"config": {"d": D, "n_train": N_TRAIN, "n_eval": N_EVAL,
                          "seed": SEED},
               "arms": {}}
    if cli.arm and os.path.exists(path):
        try:
            with open(path) as f:
                prev = json.load(f)
            if prev.get("config") == results["config"]:
                results["arms"].update(prev.get("arms", {}))
        except Exception:
            pass

    def run_arm(name, cfg, n_chunks=1):
        t0 = time.time()
        if n_chunks == 1:
            params, info = fit_flow(jax.random.key(SEED + 2), train, cfg)
        else:
            # warm-started chunked scans (tunnel-failure re-probe)
            per = cfg.n_steps // n_chunks
            ccfg = cfg._replace(n_steps=per)
            params = None
            for c in range(n_chunks):
                params, info = fit_flow(
                    jax.random.fold_in(jax.random.key(SEED + 2), c),
                    train, ccfg, init_params=params)
        fit_s = time.time() - t0
        acc, lq_x = acceptance(
            jax.jit(lambda x: flow_log_q(params, x, cfg)),
            lambda k, n: flow_sample(params, k, n, cfg))
        nll = float(-jnp.mean(lq_x))
        results["arms"][name] = {
            "acceptance": round(acc, 4),
            "held_out_nll": round(nll, 3),
            "final_train_loss": round(float(info["final_loss"]), 3),
            "fit_s": round(fit_s, 2),
            "cfg": {"coupling": cfg.coupling, "n_bins": cfg.n_bins,
                    "tail_bound": cfg.tail_bound, "hidden": cfg.hidden,
                    "n_layers": cfg.n_layers, "n_steps": cfg.n_steps,
                    "step_size": cfg.step_size, "chunks": n_chunks},
        }
        log(f"  {name:28s} acc {acc:6.4f}  heldNLL {nll:8.3f}  "
            f"fit {fit_s:6.1f}s")

    base = FlowConfig()
    ALL_ARMS = {
        "affine": (base, 1),
        "rqs": (base._replace(coupling="rqs"), 1),
        "rqs_bins4": (base._replace(coupling="rqs", n_bins=4), 1),
        "rqs_bins12_chunked":
            (base._replace(coupling="rqs", n_bins=12, n_steps=4000), 8),
        "rqs_tail3": (base._replace(coupling="rqs", tail_bound=3.0), 1),
        "rqs_tail6": (base._replace(coupling="rqs", tail_bound=6.0), 1),
        "rqs_hidden128": (base._replace(coupling="rqs", hidden=128), 1),
        "rqs_steps6000": (base._replace(coupling="rqs", n_steps=6000), 1),
        "rqs_lr3e-4": (base._replace(coupling="rqs", step_size=3e-4,
                                     n_steps=6000), 1),
        "affine_steps6000": (base._replace(n_steps=6000), 1),
        "rqs_big": (base._replace(coupling="rqs", hidden=128,
                                  n_steps=6000, step_size=3e-4), 1),
    }
    if cli.arm:
        if cli.arm != "gmm":
            cfg, ck = ALL_ARMS[cli.arm]
            run_arm(cli.arm, cfg, n_chunks=ck)
    elif SMOKE:
        run_arm("affine", base)
        run_arm("rqs", base._replace(coupling="rqs"))
    else:
        for name, (cfg, ck) in ALL_ARMS.items():
            run_arm(name, cfg, n_chunks=ck)

    # GMM context row (the production winner)
    if cli.arm and cli.arm != "gmm":
        with open(path, "w") as f:
            json.dump(results, f, indent=1)
        log("wrote", path)
        print(json.dumps({k: v["acceptance"]
                          for k, v in results["arms"].items()}))
        return
    t0 = time.time()
    gp_params, _ = fit_gmm(jax.random.key(SEED + 3), train, 8,
                           n_iters=100, cov_type="diag")
    prop = gmm_proposal(gp_params, 1.05)
    fit_s = time.time() - t0
    y_eps = jax.random.normal(jax.random.key(SEED + 4), (N_EVAL, D))
    y_u = jax.random.uniform(jax.random.key(SEED + 5), (N_EVAL,))
    y, lq_y = prop.sample_logq(y_eps, y_u)
    delta = (lp_batch(y) - lq_y) - (lp_held - prop.log_q(held))
    acc = float(jnp.mean(jnp.exp(jnp.minimum(delta, 0.0))))
    results["arms"]["gmm_diag_k8"] = {
        "acceptance": round(acc, 4),
        "held_out_nll": round(float(-jnp.mean(prop.log_q(held))), 3),
        "fit_s": round(fit_s, 2)}
    log(f"  {'gmm_diag_k8':28s} acc {acc:6.4f}")

    if SMOKE:
        results["smoke"] = True
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    log("wrote", path)
    print(json.dumps({k: v["acceptance"]
                      for k, v in results["arms"].items()}))


if __name__ == "__main__":
    main()
