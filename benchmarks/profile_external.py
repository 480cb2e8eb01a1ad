#!/usr/bin/env python
"""Host-callback (external black-box likelihood) cost — round-5 verdict #8.

The reference's real-world workload is expensive host-side simulators
farmed over the mpi4py pool (SURVEY.md §1, §5.4). This framework keeps
that capability via ``external_log_like`` (utils/external.py): one
``jax.pure_callback`` per GENERATION (vmap batches the whole population
into a single host call — the reference's rank-0-farms-the-pool shape).
What that costs per generation on the real TPU setup was unmeasured;
this harness measures it.

Arms (DreamZs, config-5-shaped d=8 nonlinear inverse posterior, the
same math implemented in JAX for the device arm and NumPy for the host
arm):

- ``device``      on-device likelihood, gens/s (the zero-overhead frame)
- ``external``    batched host callback with near-free host math —
                  Δ(1/gps) vs device = the PURE callback+tunnel
                  overhead per generation
- ``da_masked``   DelayedAcceptance with a cheap on-device surrogate
                  and the masked external exact target: the host only
                  sees PROMOTED rows — the framework's answer when the
                  simulator itself is the cost

Per chain count (64 / 256 / 1024): overhead amortizes over the batch
(one callback regardless of n), so cost *per chain-eval* falls ~n×.

Break-even guidance printed at the end: a host simulator whose batch
evaluation costs C_sim per generation dominates the callback overhead
O when C_sim ≳ 9·O (overhead <10% of wall). On this setup O is
tunnel-dominated (~30 ms dispatch floor — the TPU is remote), so the
number is a property of the deployment, not the framework; on a local
TPU host it is sub-ms.

Writes benchmarks/external_ab.json (BENCH_SMOKE=1 → *_smoke.json).
"""

import contextlib
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
from bipymc_tpu.utils.external import (external_log_like,
                                       external_log_like_masked)

D = 8
CHAIN_COUNTS = (64, 256, 1024)
BURN, TIMED = 100, 300
DA_STEPS = 300
SEED = 3
SMOKE = os.environ.get("BENCH_SMOKE") == "1"
if SMOKE:
    CHAIN_COUNTS = (16, 32)
    BURN, TIMED, DA_STEPS = 20, 60, 80


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---- config-5-shaped inverse problem: y = A tanh(B θ) + ε ----------------
rng = np.random.default_rng(7)
A_NP = rng.standard_normal((16, 16)).astype(np.float32) / 4.0
B_NP = rng.standard_normal((16, D)).astype(np.float32) / np.sqrt(D)
THETA_TRUE = rng.standard_normal(D).astype(np.float32)
Y_NP = (A_NP @ np.tanh(B_NP @ THETA_TRUE)
        + 0.05 * rng.standard_normal(16)).astype(np.float32)
SIGMA = 0.1

A_J, B_J, Y_J = jnp.asarray(A_NP), jnp.asarray(B_NP), jnp.asarray(Y_NP)


def device_log_like(theta):
    r = (A_J @ jnp.tanh(B_J @ theta) - Y_J) / SIGMA
    return -0.5 * jnp.sum(r * r) - 0.5 * jnp.sum(theta * theta)


def host_log_like_batched(thetas):
    """[n, d] -> [n], NumPy (f64 accumulate, f32 result — the host arm
    measures CALLBACK cost, not math cost; this math is ~free)."""
    t = np.asarray(thetas, np.float32)
    r = (np.tanh(t @ B_NP.T) @ A_NP.T - Y_NP) / SIGMA
    return (-0.5 * np.einsum("ni,ni->n", r, r)
            - 0.5 * np.einsum("ni,ni->n", t, t))


def surrogate_log_like(theta):
    """Cheap on-device surrogate for the DA arm: the LINEARIZED forward
    model around 0 (biased — DA's exact stage corrects it)."""
    r = (A_J @ (B_J @ theta) - Y_J) / SIGMA
    return -0.5 * jnp.sum(r * r) - 0.5 * jnp.sum(theta * theta)


def _timed_dreamzs(log_like, n_chains, label, device=None):
    """Timed warm DreamZs segment; ``device`` pins the whole program to
    a specific backend device (the CPU arms on a TPU session — see the
    axon_pjrt note in main()). A pinned CPU device in a TPU session
    must skip the compiled Pallas proposal (samplers key interpret mode
    on the default BACKEND; compiled Mosaic cannot lower to CPU)."""
    ctx = (jax.default_device(device) if device is not None
           else contextlib.nullcontext())
    kw = ({"pallas_proposal": False}
          if device is not None and jax.default_backend() == "tpu"
          else {})
    with ctx:
        s = bp.DreamZs(log_like, n_chains=n_chains, seed=SEED,
                       burnin_gens=BURN, **kw)
        x0 = jnp.zeros((n_chains, D), jnp.float32)
        s.run_mcmc(BURN + TIMED, x0, spread=1.0)  # compile + burn + run
        s.reset()
        t0 = time.time()
        s.run_mcmc(BURN + TIMED, x0, spread=1.0)
        jax.block_until_ready(s.final_state.x)
        dt = time.time() - t0
    gps = (BURN + TIMED) / dt
    log(f"  {label:16s} n={n_chains:5d}: {gps:9.1f} gens/s "
        f"({1e3 / gps:7.2f} ms/gen)")
    return gps


def _callback_supported():
    """Probe: can the DEFAULT backend route jax.pure_callback? The axon
    PJRT tunnel cannot (UNIMPLEMENTED: host send/recv callbacks) — the
    probe turns that into a recorded fact instead of a crashed run."""
    try:
        f = jax.jit(lambda x: jax.pure_callback(
            lambda a: np.asarray(a), jax.ShapeDtypeStruct((), jnp.float32),
            x))
        jax.block_until_ready(f(jnp.float32(1.0)))
        return True, ""
    except Exception as e:  # noqa: BLE001 — record, don't crash
        return False, str(e).splitlines()[0][:200]


def main():
    log("devices:", jax.devices())
    np.asarray(jnp.ones(()))                      # tunnel warmup

    on_tpu = jax.default_backend() == "tpu"
    cb_ok, cb_err = _callback_supported()
    cpu0 = None
    if not cb_ok:
        # Measured deployment fact (round 5): the axon PJRT tunnel has
        # NO host-callback channel, so external likelihoods cannot
        # execute against the remote TPU AT ALL on this setup. The
        # framework-side callback overhead is measured on the
        # in-process CPU backend instead, against a device-CPU control
        # (like-for-like Δ); on a standard local TPU host the callback
        # channel exists and the overhead is the host-transfer + sync
        # cost, bounded below by the CPU-backend number.
        cpu0 = jax.devices("cpu")[0]
        log(f"  NOTE: default backend cannot host callbacks "
            f"({cb_err}); external arms run on the CPU backend")

    results = {"config": {"d": D, "burn": BURN, "timed": TIMED,
                          "sigma": SIGMA, "seed": SEED},
               "default_backend": jax.default_backend(),
               "callback_supported_on_default_backend": cb_ok,
               "callback_probe_error": cb_err,
               "per_chain_count": {}}

    for n in CHAIN_COUNTS:
        row = {}
        if on_tpu:
            row["device_tpu_gens_per_sec"] = round(
                _timed_dreamzs(device_log_like, n, "device_tpu"), 1)
        gps_dev = _timed_dreamzs(device_log_like, n,
                                 "device_cpu" if cpu0 is not None
                                 else "device", device=cpu0)
        gps_ext = _timed_dreamzs(
            external_log_like(host_log_like_batched, batched=True), n,
            "external_cpu" if cpu0 is not None else "external",
            device=cpu0)
        # pure callback overhead per generation (host math is ~free),
        # against the SAME-backend device arm
        ovh_ms = 1e3 * (1.0 / gps_ext - 1.0 / gps_dev)
        row.update({
            "device_gens_per_sec": round(gps_dev, 1),
            "external_gens_per_sec": round(gps_ext, 1),
            "callback_overhead_ms_per_gen": round(ovh_ms, 3),
            "callback_overhead_us_per_chain_eval":
                round(1e3 * ovh_ms / n, 2),
            # a simulator batch costing >= 9x the overhead keeps the
            # callback tax under 10% of wall
            "break_even_sim_ms_per_gen_10pct": round(9.0 * ovh_ms, 1),
        })
        results["per_chain_count"][str(n)] = row

    # ---- DA masked-promotion arm (the expensive-simulator answer) ------
    host_rows = {"n": 0, "calls": 0}

    def host_exact_row(theta):
        host_rows["n"] += 1
        host_rows["calls"] += 1
        t = np.asarray(theta, np.float32)
        r = (A_NP @ np.tanh(B_NP @ t) - Y_NP) / SIGMA
        return float(-0.5 * r @ r - 0.5 * t @ t)

    n_da = CHAIN_COUNTS[0]
    masked = external_log_like_masked(host_exact_row)
    ctx = (jax.default_device(cpu0) if cpu0 is not None
           else contextlib.nullcontext())
    with ctx:
        s = bp.DelayedAcceptance(masked, surrogate_log_like, seed=SEED,
                                 n_chains=n_da, masked_exact=True,
                                 adapt=False)
        x0 = jnp.zeros(D, jnp.float32)
        s.run_mcmc(DA_STEPS, x0,
                   cov_est=jnp.eye(D, dtype=jnp.float32) * 0.05)
        host_rows["n"] = 0
        s.reset()
        t0 = time.time()
        s.run_mcmc(DA_STEPS, x0,
                   cov_est=jnp.eye(D, dtype=jnp.float32) * 0.05)
        jax.block_until_ready(s.final_state.theta)
        dt = time.time() - t0
    promoted = int(np.asarray(s._history["promoted"]).sum())
    total_rows = DA_STEPS * n_da
    results["da_masked"] = {
        "n_chains": n_da, "steps": DA_STEPS,
        "gens_per_sec": round(DA_STEPS / dt, 1),
        "promoted_fraction": round(promoted / total_rows, 4),
        "host_rows_evaluated": host_rows["n"],
        "host_rows_saved_fraction":
            round(1.0 - host_rows["n"] / total_rows, 4),
    }
    log(f"  da_masked  n={n_da}: {DA_STEPS / dt:.1f} gens/s, promoted "
        f"{promoted}/{total_rows} rows "
        f"({100 * promoted / total_rows:.1f}%), host saw "
        f"{host_rows['n']} rows")

    path = os.path.join(HERE, "external_ab.json")
    if SMOKE:
        results["smoke"] = True
        path = path.replace(".json", "_smoke.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    log("wrote", path)
    print(json.dumps({k: v for k, v in
                      results["per_chain_count"].items()}))


if __name__ == "__main__":
    main()
