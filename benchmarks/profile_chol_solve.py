#!/usr/bin/env python
"""A/B: fused batched factor+forward-solve (cholesky_solve_batched_pallas)
vs the split path (Pallas batched cholesky + XLA batched triangular_solve),
plus the isolated XLA solve share and the end-to-end config-4 effect.

Motivation: with the batched Cholesky moved to Pallas (bchol_ab.json,
1.9–3.4x), the GP log-ML's remaining linalg op is a batched single-RHS
``triangular_solve`` — which XLA lowers to the same kind of sequential
blocked HLO loop that made its batched cholesky plateau. The fused kernel
weaves the blocked forward substitution through the factorisation (two
extra [BG,8,B]-shaped MXU contractions per block) so the separate solve
disappears entirely.

Same-session interleaved best-of-3, dependent scans per timing (amortises
the ~30ms tunnel call floor). Writes benchmarks/chol_solve_ab.json.
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bipymc_tpu.ops.pallas_bchol import (cholesky_batched_pallas,
                                         cholesky_solve_batched_pallas)

HERE = os.path.dirname(os.path.abspath(__file__))


def _spd(b, n):
    x = jax.random.normal(jax.random.key(0), (b, n, 24), jnp.float32)
    return x @ jnp.swapaxes(x, -1, -2) / 24 + 3 * jnp.eye(n)


def make_runner(fn, b, n, iters):
    """fn(kmat, y) -> scalar-ish pair proxy; dependent-scan timed."""
    k = _spd(b, n)
    y = jax.random.normal(jax.random.key(1), (b, n), jnp.float32)

    def body(c, _):
        out = fn(c, y)
        # dependent feedback (exact zero net change) so the scan can't
        # elide or overlap iterations
        c2 = c + (out * 0.0)[..., None, None]
        return c2, out

    f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=iters))
    jax.block_until_ready(f(k))           # compile + warm

    def timed():
        t0 = time.time()
        jax.block_until_ready(f(k))
        return (time.time() - t0) / iters / b * 1e6   # µs per system
    return timed


def _lml_from(chol, v, n):
    return (-0.5 * jnp.sum(v * v, axis=-1)
            - jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)),
                      axis=-1)
            - 0.5 * n * jnp.log(2.0 * jnp.pi))


def micro():
    rows = []
    for b, n, iters in [(16, 512, 150), (64, 512, 80), (64, 256, 200),
                        (16, 1024, 30)]:
        def split_path(c, y):
            l = cholesky_batched_pallas(c)
            v = jax.scipy.linalg.solve_triangular(
                l, y[..., None], lower=True)[..., 0]
            return jnp.sum(_lml_from(l, v, n))

        def fused_path(c, y):
            l, v = cholesky_solve_batched_pallas(c, y)
            return jnp.sum(_lml_from(l, v, n))

        # isolated XLA batched solve on a FIXED factor (its share alone)
        l_fix = cholesky_batched_pallas(_spd(b, n))

        def solve_only(c, y):
            v = jax.scipy.linalg.solve_triangular(
                l_fix + 0.0 * c[..., :1, :1], y[..., None],
                lower=True)[..., 0]
            return jnp.sum(v * v)

        t_split = make_runner(split_path, b, n, iters)
        t_fused = make_runner(fused_path, b, n, iters)
        t_solve = make_runner(solve_only, b, n, iters)
        ts, tf, tv = [], [], []
        for _ in range(3):
            ts.append(t_split())
            tf.append(t_fused())
            tv.append(t_solve())
        row = {"b": b, "n": n,
               "split_us_per_sys": round(min(ts), 2),
               "fused_us_per_sys": round(min(tf), 2),
               "xla_solve_only_us": round(min(tv), 2),
               "speedup": round(min(ts) / min(tf), 2)}
        rows.append(row)
        print(json.dumps(row), file=sys.stderr, flush=True)
    return rows


def end_to_end():
    """Config-4 shape: DRAM over the vmapped GP log-ML, old vs new path."""
    import bipymc_tpu as bp
    from bipymc_tpu.gp.regressor import (GpRegressor, _chol_dispatch_diff)

    rng = np.random.default_rng(7)
    n_train, n_chains, gens = 512, 64, 2000
    x = rng.uniform(-4, 4, (n_train, 2)).astype(np.float32)
    f = np.sin(2 * x[:, 0]) * np.cos(x[:, 1])
    y = (f + rng.normal(0, 0.2, n_train)).astype(np.float32)
    gp = GpRegressor()
    xj, yj = jnp.asarray(x), jnp.asarray(y)

    def params_of(theta):
        return {"log_lengthscale": theta[0:2], "log_sigma_f": theta[2],
                "log_sigma_n": theta[3]}

    def log_post_new(theta):
        return (gp._lml_impl(params_of(theta), xj, yj)
                - 0.5 * jnp.sum((theta / 2.0) ** 2))

    def lml_old(p):
        kmat = gp._gram(p, xj)
        chol = _chol_dispatch_diff(kmat)
        v = jax.scipy.linalg.solve_triangular(chol, yj, lower=True)
        return _lml_from(chol, v, n_train)

    def log_post_old(theta):
        return (lml_old(params_of(theta))
                - 0.5 * jnp.sum((theta / 2.0) ** 2))

    samplers = {}
    for label, lp in [("old(bchol+solve)", log_post_old),
                      ("new(fused)", log_post_new)]:
        s = bp.Dram(lp, seed=1, n_chains=n_chains)
        t0 = time.time()
        s.run_mcmc(gens, jnp.zeros(4), cov_est=jnp.eye(4) * 0.05)
        print(f"{label}: compile+warm {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)
        samplers[label] = s
    best = {k: np.inf for k in samplers}
    for rep in range(3):
        for label, s in samplers.items():
            t0 = time.time()
            s.run_mcmc(gens)
            w = time.time() - t0
            best[label] = min(best[label], w)
            print(f"rep{rep} {label}: {w:.3f}s = "
                  f"{2 * n_chains * gens / w:,.0f} chol-evals/s",
                  file=sys.stderr, flush=True)
    return {label: {"best_s": round(w, 3),
                    "chol_evals_per_sec": round(2 * n_chains * gens / w)}
            for label, w in best.items()}


def main():
    print("backend:", jax.default_backend(), jax.devices(), file=sys.stderr)
    np.asarray(jnp.ones(()))
    rows = micro()
    e2e = end_to_end()
    out = {"micro": rows, "end_to_end_config4": e2e}
    with open(os.path.join(HERE, "chol_solve_ab.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
