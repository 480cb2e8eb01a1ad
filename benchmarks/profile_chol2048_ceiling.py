#!/usr/bin/env python
"""Is the n=2048 batched-Cholesky plateau fundamental? (round-4 #6)

Config 4's n=2048 variant measures ~5% of f32 peak end-to-end. The
question the verdict poses: can the multi-panel-lookahead trick (factor
panel k+1 while panel k's trailing update streams) — or anything else —
push past 10%, or is the plateau structural? Four measurements decide:

1. ``xla_chol``: XLA batched cholesky at n=2048, B ∈ {1, 4, 16} —
   if per-matrix time is ~flat in B, the cost is the sequential blocked
   HLO chain, not FLOPs.
2. ``matmul``: the same FLOPs as pure batched GEMM
   ([B,2048,2048] @ [B,2048,2048], f32/HIGHEST) — what the MXU delivers
   when there is NO dependent chain. The gap xla_chol/matmul is the
   serial-chain tax.
3. ``pallas_single``: ops/pallas_chol.py (the BG=1 kernel) at n=2048 —
   our own kernel's dependent row-chain floor: ~n sequential [1, n]
   row eliminations whose per-row latency lower-bounds ANY
   right-looking scheme that keeps the factorisation order.
4. ``trailing_fraction``: per-panel trailing-update GEMM time vs total —
   the ONLY part lookahead can hide. If it is a small fraction of the
   panel chain, lookahead's ceiling is that fraction.

The structural fact that decides the verdict: the BG-batch amortisation
that made ops/pallas_bchol.py win at n ≤ 1024 needs BG matrices
resident in VMEM — BG·n²·4B = BG·16 MB at n=2048, over the chip's
128 MB VMEM at BG=8 *before* workspace, and over the 16 MB scoped
default at BG=1. The batch lever is capacity-barred exactly where the
serial chain is longest. Writes benchmarks/chol2048_ceiling.json.
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

HERE = os.path.dirname(os.path.abspath(__file__))
N = 2048
SMOKE = os.environ.get("BENCH_SMOKE") == "1"
if SMOKE:
    N = 256
PEAK_GF = 49_000.0
CHOL_FLOPS = N ** 3 / 3
MM_FLOPS = 2 * N ** 3


ITERS = 16        # iterations chained INSIDE one dispatch: the axon
                  # tunnel's ~25-30ms per-call floor would otherwise
                  # swamp every ms-scale op here (§18 methodology —
                  # first run of this harness reported a 2048³ matmul at
                  # 26ms because it measured the tunnel, not the MXU)


def timed_loop(step, x0, *consts, reps=3):
    """Per-iteration time of ``step(carry, *consts)`` chained ITERS
    times in one jitted fori_loop (data dependency through the carry
    defeats elision). ``consts`` ride as ARGUMENTS — closing over a
    [16, 2048, 2048] operand bakes a 256MB constant into the program
    and the axon remote-compile request rejects it (HTTP 413)."""
    run = jax.jit(lambda x, *cs: jax.lax.fori_loop(
        0, ITERS, lambda i, c: step(c, *cs), x))
    out = jax.block_until_ready(run(x0, *consts))   # compile + warm
    best = np.inf
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(run(x0, *consts))
        best = min(best, time.time() - t0)
    return best / ITERS, out


def spd(key, b):
    a = jax.random.normal(key, (b, N, N), jnp.float32) / np.sqrt(N)
    return jnp.einsum("bij,bkj->bik", a, a,
                      precision=jax.lax.Precision.HIGHEST) \
        + 2.0 * jnp.eye(N)[None]


def main():
    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    np.asarray(jnp.ones(()))
    out = {"n": N, "peak_gflops_f32": PEAK_GF}

    rows = []
    for b in (1, 4, 16):
        mats = jax.block_until_ready(spd(jax.random.key(b), b))
        # carry the factor; re-derive the input from it so each
        # iteration depends on the last (tiny add, not counted apart)
        t, _ = timed_loop(
            lambda L, m: jnp.linalg.cholesky(m + 1e-30 * L),
            jnp.linalg.cholesky(mats), mats)
        per = t / b
        rows.append({"b": b, "us_per_matrix": round(per * 1e6, 1),
                     "gflops": round(CHOL_FLOPS / per / 1e9, 1),
                     "pct_peak": round(100 * CHOL_FLOPS / per / 1e9
                                       / PEAK_GF, 2)})
        print("xla_chol", rows[-1], file=sys.stderr, flush=True)
    out["xla_chol"] = rows

    b = 4
    x = jax.block_until_ready(
        jax.random.normal(jax.random.key(99), (b, N, N), jnp.float32)
        / np.sqrt(N))
    t, _ = timed_loop(lambda y, xc: jnp.matmul(
        xc, y, precision=jax.lax.Precision.HIGHEST), x, x)
    per = t / b
    out["matmul_same_shape"] = {
        "b": b, "us_per_matrix": round(per * 1e6, 1),
        "gflops": round(MM_FLOPS / per / 1e9, 1),
        "pct_peak": round(100 * MM_FLOPS / per / 1e9 / PEAK_GF, 2)}
    print("matmul", out["matmul_same_shape"], file=sys.stderr, flush=True)

    from bipymc_tpu.ops.pallas_chol import cholesky_pallas
    interp = jax.default_backend() != "tpu"
    mats1 = jax.block_until_ready(spd(jax.random.key(1), 1))[0]
    t, got = timed_loop(
        lambda L, m: cholesky_pallas(m + 1e-30 * L, interpret=interp),
        jnp.linalg.cholesky(mats1), mats1)
    ref = jnp.linalg.cholesky(mats1)
    err = float(jnp.max(jnp.abs(jnp.tril(got) - ref)))
    out["pallas_single"] = {
        "us_per_matrix": round(t * 1e6, 1),
        "gflops": round(CHOL_FLOPS / t / 1e9, 1),
        "pct_peak": round(100 * CHOL_FLOPS / t / 1e9 / PEAK_GF, 2),
        "max_abs_err_vs_xla": err}
    print("pallas_single", out["pallas_single"], file=sys.stderr,
          flush=True)

    # trailing-update share: total GEMM FLOPs in a right-looking blocked
    # cholesky are ~the full n^3/3 while the panel chain's FLOPs are
    # O(n^2·W) — but TIME divides the other way. Estimate the trailing
    # GEMM time by running the actual sequence of [r, B]x[r, B] update
    # shapes at matmul rates: sum_k (n - k·B)^2 · B · 2 FLOPs at the
    # measured matmul rate, vs the measured total.
    Bblk = 128
    gemm_flops = sum(2 * (N - (k + 1) * Bblk) ** 2 * Bblk
                     for k in range(N // Bblk))
    mm_rate = out["matmul_same_shape"]["gflops"] * 1e9
    t_gemm_ideal = gemm_flops / mm_rate
    t_total = out["pallas_single"]["us_per_matrix"] / 1e6
    out["lookahead_ceiling"] = {
        "trailing_gemm_flops": gemm_flops,
        "t_trailing_at_matmul_rate_us": round(t_gemm_ideal * 1e6, 1),
        "t_total_us": round(t_total * 1e6, 1),
        "max_lookahead_speedup": round(
            t_total / max(t_total - t_gemm_ideal, 1e-9), 3),
        "note": "lookahead can only hide the trailing GEMMs behind the "
                "panel chain; if t_trailing << t_total the chain IS the "
                "wall and lookahead's ceiling is t_total/(t_total - "
                "t_trailing)",
    }
    print("lookahead_ceiling", out["lookahead_ceiling"], file=sys.stderr,
          flush=True)

    vmem_mb = N * N * 4 / 2 ** 20
    out["bg_batch_capacity"] = {
        "matrix_vmem_mb": round(vmem_mb, 1),
        "bg8_vmem_mb": round(8 * vmem_mb, 1),
        "chip_vmem_mb": 128,
        "note": "the BG=8 batch amortisation (the n<=1024 win) needs "
                "8 matrices resident in VMEM — capacity-barred at "
                "n=2048",
    }
    if SMOKE:
        out["smoke"] = True
    path = os.path.join(HERE, "chol2048_ceiling.json")
    if SMOKE:
        path = path.replace(".json", "_smoke.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"xla_pct_peak_b16": out["xla_chol"][-1]["pct_peak"],
                      "matmul_pct_peak":
                          out["matmul_same_shape"]["pct_peak"],
                      "max_lookahead_speedup":
                          out["lookahead_ceiling"]["max_lookahead_speedup"]}))


if __name__ == "__main__":
    main()
